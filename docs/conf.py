# Sphinx configuration (capability match for the reference's furo-themed
# docs, /root/reference/docs/conf.py).  The build environment here does not
# ship sphinx, so CI treats `make docs` as optional; the sources double as
# plain markdown (docs/*.md via myst-parser when available).

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "Bayesian Ensembling (TPU-native)"
author = "bayesian_ensembling_tpu developers"
copyright = "2026"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.mathjax",
    "sphinxcontrib.bibtex",
    "myst_parser",
]

bibtex_bibfiles = ["refs.bib"]
source_suffix = {".rst": "restructuredtext", ".md": "markdown"}
master_doc = "index"

html_theme = "furo"
exclude_patterns = ["_build"]
