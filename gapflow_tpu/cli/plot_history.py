"""CLI: plot scalar run histories incl. GP diagnostics (gpf_plot_history)."""

import os
from argparse import ArgumentParser

import matplotlib.pyplot as plt

from ..viz.plotting import _plot_history, _plot_gp_history
from ..viz.utils import get_pipeline


def get_parser():
    parser = ArgumentParser()
    parser.add_argument("-p", "--path", default=".", help="search path")
    parser.add_argument("-m", "--mode", default="select",
                        choices=["single", "all", "select"])
    return parser


def main():
    args = get_parser().parse_args()

    files = get_pipeline(args.path, mode=args.mode, name="history.csv")
    for fname in files:
        fig, ax = plt.subplots(1, 3, figsize=(10, 3))
        _plot_history(ax, fname)

        outdir = os.path.dirname(fname)
        for tag in ("zz", "xz", "yz"):
            gp_csv = os.path.join(outdir, f"gp_{tag}.csv")
            if os.path.exists(gp_csv):
                fig2, ax2 = plt.subplots(1, 3, figsize=(10, 3))
                fig2.suptitle(f"GP {tag}")
                _plot_gp_history(ax2, gp_csv)

    plt.show()


if __name__ == "__main__":
    main()
