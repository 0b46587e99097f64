"""Build the tutorial notebooks from their percent-format sources.

Each tutorial is authored as a jupytext-style percent script in
``doc/tutorials/src/NN_name.py`` (cells delimited by ``# %%`` /
``# %% [markdown]``; markdown lines carry a leading ``# ``).  This
script converts them to ``doc/tutorials/NN_name.ipynb`` — the files
nbsphinx renders and tests/test_tutorials.py executes.

Run:  python doc/tutorials/build_notebooks.py
The emitted notebooks are committed; re-running must be a no-op.
"""

import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "src")

CELL_RE = re.compile(r"^# %%( \[markdown\])?\s*$")


def parse_percent(text):
    """Yield (cell_type, source_lines) from a percent-format script."""
    cells = []
    cur_type, cur = None, []
    for line in text.splitlines():
        m = CELL_RE.match(line)
        if m:
            if cur_type is not None:
                cells.append((cur_type, cur))
            cur_type = "markdown" if m.group(1) else "code"
            cur = []
        elif cur_type is not None:
            cur.append(line)
    if cur_type is not None:
        cells.append((cur_type, cur))

    out = []
    for ctype, lines in cells:
        while lines and not lines[0].strip():
            lines.pop(0)
        while lines and not lines[-1].strip():
            lines.pop()
        if not lines:
            continue
        if ctype == "markdown":
            body = [ln[2:] if ln.startswith("# ") else ln.lstrip("#")
                    for ln in lines]
        else:
            body = lines
        out.append((ctype, body))
    return out


def to_notebook(cells):
    nb_cells = []
    for i, (ctype, lines) in enumerate(cells):
        src = [ln + "\n" for ln in lines]
        if src:
            src[-1] = src[-1].rstrip("\n")
        cell = {"cell_type": ctype, "id": f"cell-{i:02d}", "metadata": {},
                "source": src}
        if ctype == "code":
            cell["execution_count"] = None
            cell["outputs"] = []
        nb_cells.append(cell)
    return {
        "cells": nb_cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def build(check=False):
    changed = []
    for fname in sorted(os.listdir(SRC)):
        if not fname.endswith(".py"):
            continue
        with open(os.path.join(SRC, fname)) as fh:
            nb = to_notebook(parse_percent(fh.read()))
        out_path = os.path.join(HERE, fname[:-3] + ".ipynb")
        blob = json.dumps(nb, indent=1, ensure_ascii=False) + "\n"
        old = None
        if os.path.exists(out_path):
            with open(out_path) as fh:
                old = fh.read()
        if old != blob:
            changed.append(os.path.basename(out_path))
            if not check:
                with open(out_path, "w") as fh:
                    fh.write(blob)
    return changed


if __name__ == "__main__":
    check = "--check" in sys.argv
    changed = build(check=check)
    if check and changed:
        print("stale notebooks:", ", ".join(changed))
        sys.exit(1)
    print("rebuilt:" if changed else "up to date",
          ", ".join(changed) if changed else "")
