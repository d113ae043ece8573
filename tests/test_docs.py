"""Docs-build preflight: everything sphinx-autodoc would resolve, checked
without sphinx (the build environment does not ship it; CI runs the real
``sphinx-build -W`` job, .github/workflows/ci.yml).

Validates the classic ``-W`` failure modes locally:
  * every ``automodule::`` target imports;
  * every name in a ``:members:`` list exists on its module;
  * every toctree entry has a source file;
  * every ``:cite:`` key exists in refs.bib;
  * every documented module has a docstring (autodoc emits a warning for
    missing ones under some configurations).
"""

import os
import re
import importlib

import pytest

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs")


def _rst_sources():
    out = {}
    for fn in os.listdir(DOCS):
        if fn.endswith(".rst"):
            with open(os.path.join(DOCS, fn)) as f:
                out[fn] = f.read()
    return out


def _automodule_blocks():
    """Yield (module_name, members_list_or_None) for every autodoc directive."""
    blocks = []
    for _, text in _rst_sources().items():
        for m in re.finditer(
            r"^\.\. automodule:: (\S+)\n((?:[ \t]+:.*\n)*)", text, re.M
        ):
            mod = m.group(1)
            opts = m.group(2)
            members = None
            mm = re.search(r":members:\s*(.*)", opts)
            if mm and mm.group(1).strip():
                members = [s.strip() for s in mm.group(1).split(",")]
            blocks.append((mod, members))
    return blocks


def test_automodule_targets_import_and_members_exist():
    blocks = _automodule_blocks()
    assert blocks, "no automodule directives found in docs/"
    for mod_name, members in blocks:
        mod = importlib.import_module(mod_name)
        assert mod.__doc__, f"{mod_name} has no module docstring"
        for name in members or []:
            assert hasattr(mod, name), f"{mod_name} lacks documented member {name}"


def test_toctree_entries_exist():
    for fn, text in _rst_sources().items():
        in_toctree = False
        for line in text.splitlines():
            if line.strip().startswith(".. toctree::"):
                in_toctree = True
                continue
            if in_toctree:
                s = line.strip()
                if not s:
                    continue
                if s.startswith(":"):
                    continue
                if line and not line[0].isspace():
                    in_toctree = False
                    continue
                base = os.path.join(DOCS, s)
                assert any(
                    os.path.exists(base + ext) for ext in (".rst", ".md")
                ), f"toctree entry {s!r} in {fn} has no source file"


def test_cite_keys_resolve():
    with open(os.path.join(DOCS, "refs.bib")) as f:
        bib = f.read()
    keys = set(re.findall(r"@\w+\{([^,]+),", bib))
    for fn, text in _rst_sources().items():
        for key in re.findall(r":cite:`([^`]+)`", text):
            for k in key.split(","):
                assert k.strip() in keys, f"unknown bib key {k!r} in {fn}"


def test_conf_requirements_documented():
    """conf.py's extension list matches what the CI docs job installs."""
    with open(os.path.join(DOCS, "conf.py")) as f:
        conf = f.read()
    ci = os.path.join(
        os.path.dirname(__file__), "..", ".github", "workflows", "ci.yml"
    )
    with open(ci) as f:
        workflow = f.read()
    assert "sphinx-build" in workflow, "CI has no docs build step"
    for pkg in ("furo", "myst-parser", "sphinxcontrib-bibtex"):
        assert pkg in workflow, f"CI docs job missing {pkg}"
    assert "sphinxcontrib.bibtex" in conf and "myst_parser" in conf


def test_fallback_build_produces_html(tmp_path):
    """The sphinx-free builder (docs/build_fallback.py) produces a real HTML
    rendering of the doc sources IN THIS environment — the docs build is
    demonstrated on every test run, not just declared for CI."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "build_fallback", os.path.join(DOCS, "build_fallback.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    outdir = mod.build(str(tmp_path))

    pages = sorted(os.listdir(outdir))
    assert "index.html" in pages
    # every toctree entry got a page (skip option lines like ":maxdepth: 1")
    for _, text in _rst_sources().items():
        for m in re.finditer(r"^\.\. toctree::\n((?:[ \t]+.*\n?)*)", text, re.M):
            for line in m.group(1).splitlines():
                entry = line.strip()
                if entry and not entry.startswith(":"):
                    assert f"{entry}.html" in pages, entry
    index = open(os.path.join(outdir, "index.html")).read()
    # every automodule target and every :members: name is rendered
    for modname, members in _automodule_blocks():
        assert modname in index, f"automodule {modname} missing from HTML"
        for name in members or []:
            assert name in index, f"member {name} missing from HTML"
    # bibliography rendered with anchors for the cited keys
    for _, text in _rst_sources().items():
        for key in re.findall(r":cite:`([^`]+)`", text):
            for k in key.split(","):
                assert f'id="bib-{k.strip()}"' in index
