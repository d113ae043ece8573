"""Sphinx-free static HTML docs builder.

The reference ships buildable furo docs (/root/reference/docs/conf.py);
this environment has no sphinx, so "the docs build" would otherwise exist
only as an unexercised CI job.  This builder produces a real, navigable
HTML rendering of the same sources — docs/index.rst (prose, toctree,
automodule directives, bibliography) plus the markdown pages — using only
the standard library and ``inspect``, and is exercised by
tests/test_docs.py so every commit demonstrates a working build.

It intentionally implements the subset of rst/markdown/autodoc these docs
use; the real sphinx job (.github/workflows/ci.yml) remains the canonical
build where sphinx is available.

Usage:
    python docs/build_fallback.py [outdir]   # default docs/_build/fallback
"""

from __future__ import annotations

import html
import importlib
import inspect
import os
import re
import sys

DOCS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(DOCS)

_CSS = """
body { margin: 0; font: 16px/1.55 system-ui, sans-serif; color: #1a1c1e; }
.layout { display: flex; min-height: 100vh; }
nav { width: 230px; flex: none; background: #f4f5f7; border-right: 1px solid #e0e2e6;
      padding: 1.2rem 1rem; box-sizing: border-box; }
nav a { display: block; color: #34406b; text-decoration: none; padding: .15rem 0; }
nav a:hover { text-decoration: underline; }
nav .brand { font-weight: 700; margin-bottom: .8rem; color: #1a1c1e; }
main { flex: 1; max-width: 58rem; padding: 1.5rem 2.5rem 4rem; box-sizing: border-box; }
h1, h2, h3 { line-height: 1.25; }
h1 { border-bottom: 2px solid #e0e2e6; padding-bottom: .3rem; }
code, pre { font-family: ui-monospace, SFMono-Regular, Menlo, monospace;
            background: #f4f5f7; border-radius: 4px; }
code { padding: .08rem .3rem; font-size: .92em; }
pre { padding: .7rem .9rem; overflow-x: auto; }
pre code { padding: 0; background: none; }
table { border-collapse: collapse; margin: 1rem 0; }
th, td { border: 1px solid #d5d8dd; padding: .35rem .6rem; text-align: left; }
th { background: #f4f5f7; }
.apimod { border: 1px solid #e0e2e6; border-radius: 6px; margin: 1.2rem 0;
          padding: .2rem 1.1rem .6rem; }
.apimod > h3 { margin-top: .8rem; }
.member { margin: .9rem 0 .9rem 1rem; }
.member .sig { font-family: ui-monospace, Menlo, monospace; font-size: .9em;
               background: #eef1f5; padding: .3rem .6rem; border-radius: 4px;
               display: inline-block; }
.member .doc { margin: .35rem 0 0 .4rem; white-space: pre-wrap;
               font-size: .93em; color: #333; }
.bibitem { margin: .6rem 0; }
.bibkey { color: #6b4034; font-family: ui-monospace, Menlo, monospace; }
"""


# --------------------------------------------------------------- markdown
def md_to_html(text: str) -> str:
    """Minimal markdown -> HTML: headers, fenced code, lists, tables,
    links, emphasis, inline code.  Enough for docs/*.md."""
    out: list[str] = []
    lines = text.split("\n")
    i = 0
    in_list = False
    para: list[str] = []

    def flush_para():
        nonlocal para
        if para:
            # Join with a space, not a newline: the inline regexes cannot
            # match markup that spans a source-line wrap.
            out.append("<p>" + _inline(" ".join(para)) + "</p>")
            para = []

    def close_list():
        nonlocal in_list
        if in_list:
            out.append("</ul>")
            in_list = False

    while i < len(lines):
        line = lines[i]
        if line.startswith("```"):
            flush_para()
            close_list()
            lang = line[3:].strip()
            block: list[str] = []
            i += 1
            while i < len(lines) and not lines[i].startswith("```"):
                block.append(lines[i])
                i += 1
            out.append(
                f'<pre><code class="language-{html.escape(lang)}">'
                + html.escape("\n".join(block))
                + "</code></pre>"
            )
            i += 1
            continue
        m = re.match(r"^(#{1,4})\s+(.*)$", line)
        if m:
            flush_para()
            close_list()
            n = len(m.group(1))
            out.append(f"<h{n}>{_inline(m.group(2))}</h{n}>")
            i += 1
            continue
        if (
            "|" in line
            and i + 1 < len(lines)
            and re.match(r"^\s*\|?[\s:|-]+\|[\s:|-]*$", lines[i + 1])
        ):
            flush_para()
            close_list()
            header = [c.strip() for c in line.strip().strip("|").split("|")]
            i += 2
            rows = []
            while i < len(lines) and "|" in lines[i]:
                rows.append(
                    [c.strip() for c in lines[i].strip().strip("|").split("|")]
                )
                i += 1
            out.append("<table><tr>" + "".join(f"<th>{_inline(c)}</th>" for c in header) + "</tr>")
            for r in rows:
                out.append("<tr>" + "".join(f"<td>{_inline(c)}</td>" for c in r) + "</tr>")
            out.append("</table>")
            continue
        m = re.match(r"^\s*[-*]\s+(.*)$", line)
        if m:
            flush_para()
            if not in_list:
                out.append("<ul>")
                in_list = True
            item = [m.group(1)]
            # hanging continuation lines
            while (
                i + 1 < len(lines)
                and lines[i + 1].startswith("  ")
                and not re.match(r"^\s*[-*]\s+", lines[i + 1])
            ):
                item.append(lines[i + 1].strip())
                i += 1
            out.append("<li>" + _inline(" ".join(item)) + "</li>")
            i += 1
            continue
        if not line.strip():
            flush_para()
            close_list()
            i += 1
            continue
        para.append(line)
        i += 1
    flush_para()
    close_list()
    return "\n".join(out)


def _inline(text: str) -> str:
    text = html.escape(text)
    text = re.sub(r"``(.+?)``", r"<code>\1</code>", text)
    text = re.sub(r"`(.+?)`", r"<code>\1</code>", text)
    text = re.sub(r"\*\*(.+?)\*\*", r"<strong>\1</strong>", text)
    text = re.sub(r"(?<![\w*])\*([^*\n]+)\*(?![\w*])", r"<em>\1</em>", text)
    text = re.sub(
        r"\[([^\]]+)\]\(([^)]+)\)",
        lambda m: '<a href="%s">%s</a>'
        % (m.group(2).replace(".md", ".html"), m.group(1)),
        text,
    )
    return text


# --------------------------------------------------------------- autodoc
def render_member(mod, name: str) -> str:
    obj = getattr(mod, name)
    try:
        sig = str(inspect.signature(obj)) if callable(obj) else ""
    except (ValueError, TypeError):
        sig = ""
    kind = (
        "class"
        if inspect.isclass(obj)
        else "def" if callable(obj) else "data"
    )
    doc = inspect.getdoc(obj) or ""
    parts = [
        '<div class="member" id="%s">' % html.escape(f"{mod.__name__}.{name}"),
        '<span class="sig">%s <b>%s</b>%s</span>'
        % (kind, html.escape(name), html.escape(sig)),
    ]
    if doc:
        parts.append('<div class="doc">%s</div>' % html.escape(doc))
    if inspect.isclass(obj):
        for mname, meth in sorted(vars(obj).items()):
            if mname.startswith("_") or not callable(meth):
                continue
            mdoc = inspect.getdoc(meth)
            if not mdoc:
                continue
            try:
                msig = str(inspect.signature(meth))
            except (ValueError, TypeError):
                msig = "(...)"
            parts.append(
                '<div class="member"><span class="sig">%s%s</span>'
                '<div class="doc">%s</div></div>'
                % (html.escape(mname), html.escape(msig), html.escape(mdoc))
            )
    parts.append("</div>")
    return "\n".join(parts)


def render_automodule(modname: str, members) -> str:
    mod = importlib.import_module(modname)
    if members is None:
        members = [
            n
            for n in (getattr(mod, "__all__", None) or sorted(vars(mod)))
            if not n.startswith("_") and not inspect.ismodule(getattr(mod, n))
        ]
    moddoc = inspect.getdoc(mod) or ""
    first = moddoc.split("\n\n")[0]
    body = "".join(render_member(mod, n) for n in members)
    return (
        '<div class="apimod"><h3 id="%s"><code>%s</code></h3>'
        '<div class="doc">%s</div>%s</div>'
        % (html.escape(modname), html.escape(modname), html.escape(first), body)
    )


# --------------------------------------------------------------- rst index
def parse_bib(path: str) -> dict:
    """Brace-counting BibTeX parser (regexes cap nesting depth and silently
    drop entries like ``Fran{\\c{c}}ois`` with doubly-nested braces)."""
    entries = {}
    with open(path, encoding="utf-8") as f:
        text = f.read()
    for m in re.finditer(r"@\w+\{", text):
        depth, j = 1, m.end()
        while j < len(text) and depth:
            depth += {"{": 1, "}": -1}.get(text[j], 0)
            j += 1
        body = text[m.end() : j - 1]
        key, _, rest = body.partition(",")
        fields = {}
        for fm in re.finditer(r"(\w+)\s*=\s*\{", rest):
            depth, q = 1, fm.end()
            while q < len(rest) and depth:
                depth += {"{": 1, "}": -1}.get(rest[q], 0)
                q += 1
            val = rest[fm.end() : q - 1]
            # Drop TeX control sequences and grouping braces for display.
            val = re.sub(r"\\[a-zA-Z]+", "", val)
            fields[fm.group(1).lower()] = re.sub(r"[{}]", "", val).strip()
        entries[key.strip()] = fields
    return entries


def render_rst(outdir: str, stem: str, pages: list) -> None:
    """Render one .rst source (title/automodule/toctree/bibliography
    subset) to HTML — index.rst and any other rst page in the toctree."""
    with open(os.path.join(DOCS, stem + ".rst"), encoding="utf-8") as f:
        rst = f.read()
    bib = parse_bib(os.path.join(DOCS, "refs.bib"))

    out = []
    title = stem
    lines = rst.split("\n")
    i = 0
    para: list[str] = []

    def flush():
        nonlocal para
        if para:
            text = html.escape(" ".join(para))
            text = re.sub(r"``(.+?)``", r"<code>\1</code>", text)
            text = re.sub(
                r":cite:<code>([\w,\s]+)</code>|:cite:`([\w,\s]+)`",
                lambda m: ", ".join(
                    '<a href="#bib-{0}">[{0}]</a>'.format(k.strip())
                    for k in (m.group(1) or m.group(2)).split(",")
                ),
                text,
            )
            out.append(f"<p>{text}</p>")
            para = []

    while i < len(lines):
        line = lines[i]
        if i + 1 < len(lines) and re.match(r"^=+\s*$", lines[i + 1]) and line.strip():
            flush()
            title = line.strip()
            out.append(f"<h1>{html.escape(line)}</h1>")
            i += 2
            continue
        if i + 1 < len(lines) and re.match(r"^-+\s*$", lines[i + 1]) and line.strip():
            flush()
            out.append(f"<h2>{html.escape(line)}</h2>")
            i += 2
            continue
        if line.startswith(".. toctree::"):
            flush()
            i += 1
            items = []
            while i < len(lines) and (
                lines[i].startswith("   ") or not lines[i].strip()
            ):
                entry = lines[i].strip()
                if entry and not entry.startswith(":"):
                    items.append(entry)
                i += 1
            out.append(
                "<ul>"
                + "".join(
                    f'<li><a href="{e}.html">{e}</a></li>' for e in items
                )
                + "</ul>"
            )
            continue
        m = re.match(r"^\.\. automodule:: (\S+)", line)
        if m:
            flush()
            modname = m.group(1)
            i += 1
            members = None
            while i < len(lines) and lines[i].strip().startswith(":"):
                om = re.match(r"^\s*:members:\s*(.*)$", lines[i])
                if om and om.group(1).strip():
                    members = [s.strip() for s in om.group(1).split(",")]
                i += 1
            out.append(render_automodule(modname, members))
            continue
        if line.startswith(".. bibliography"):
            flush()
            for key, fields in sorted(bib.items()):
                out.append(
                    '<div class="bibitem" id="bib-%s">'
                    '<span class="bibkey">[%s]</span> %s (%s). <em>%s</em>. %s</div>'
                    % (
                        key,
                        key,
                        html.escape(fields.get("author", "")),
                        html.escape(fields.get("year", "")),
                        html.escape(fields.get("title", "")),
                        html.escape(
                            fields.get("journal", fields.get("booktitle", ""))
                        ),
                    )
                )
            i += 1
            continue
        if not line.strip():
            flush()
            i += 1
            continue
        para.append(line.strip())
        i += 1
    flush()
    write_page(outdir, stem, title, "\n".join(out), pages)


def write_page(outdir: str, stem: str, title: str, body: str, pages: list) -> None:
    nav = "".join(
        f'<a href="{p}.html">{t}</a>' for p, t in pages
    )
    doc = f"""<!doctype html><html lang="en"><head><meta charset="utf-8">
<title>{html.escape(title)}</title><style>{_CSS}</style></head>
<body><div class="layout">
<nav><div class="brand">bayesian_ensembling_tpu</div>{nav}</nav>
<main>{body}</main>
</div></body></html>"""
    with open(os.path.join(outdir, stem + ".html"), "w", encoding="utf-8") as f:
        f.write(doc)


def build(outdir: str | None = None) -> str:
    outdir = outdir or os.path.join(DOCS, "_build", "fallback")
    os.makedirs(outdir, exist_ok=True)
    sys.path.insert(0, REPO)
    md_pages = [
        fn[:-3] for fn in sorted(os.listdir(DOCS)) if fn.endswith(".md")
    ]
    rst_pages = [
        fn[:-4]
        for fn in sorted(os.listdir(DOCS))
        if fn.endswith(".rst") and fn != "index.rst"
    ]
    pages = (
        [("index", "Home")]
        + [(p, p.capitalize()) for p in md_pages]
        + [(p, p.capitalize()) for p in rst_pages]
    )
    for stem in md_pages:
        with open(os.path.join(DOCS, stem + ".md"), encoding="utf-8") as f:
            text = f.read()
        m = re.match(r"^#\s+(.*)$", text.split("\n", 1)[0])
        title = m.group(1) if m else stem
        write_page(outdir, stem, title, md_to_html(text), pages)
    for stem in rst_pages:
        render_rst(outdir, stem, pages)
    render_rst(outdir, "index", pages)
    return outdir


if __name__ == "__main__":
    dest = build(sys.argv[1] if len(sys.argv) > 1 else None)
    n = len([f for f in os.listdir(dest) if f.endswith(".html")])
    print(f"built {n} pages -> {dest}")
