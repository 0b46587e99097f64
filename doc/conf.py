# Sphinx configuration for the gapflow-tpu documentation.
#
# Build requirements (doc/requirements.txt): sphinx, sphinx-book-theme,
# myst-parser, nbsphinx.  The docs build is optional — the tutorials are
# additionally executed headlessly by tests/test_tutorials.py, so their
# code stays correct even on machines without Sphinx.
#
# Reference layout parity: /root/reference/doc/conf.py
import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "gapflow-tpu"
copyright = "2026, gapflow-tpu developers"
author = "gapflow-tpu developers"

try:
    from importlib.metadata import version as _v
    release = _v("gapflow-tpu")
except Exception:
    release = "0.1"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.mathjax",
    "sphinx.ext.viewcode",
    "myst_parser",
    "nbsphinx",
]

autosummary_generate = True
autodoc_member_order = "bysource"
autodoc_mock_imports = []  # jax/numpy/scipy are hard requirements

# Notebooks are executed by the test suite (tests/test_tutorials.py), not
# at docs-build time: TPU/large-grid cells would be too slow on RTD-style
# builders.
nbsphinx_execute = "never"

myst_enable_extensions = ["amsmath", "dollarmath", "colon_fence"]

templates_path = ["_templates"]
exclude_patterns = ["_build", "Thumbs.db", ".DS_Store", "tutorials/src",
                    "**.ipynb_checkpoints"]

source_suffix = {".rst": "restructuredtext", ".md": "markdown"}

try:
    import sphinx_book_theme  # noqa: F401
    html_theme = "sphinx_book_theme"
except ImportError:
    html_theme = "alabaster"
html_static_path = []
