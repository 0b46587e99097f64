"""CLI: overlay all stored 1D frames (gpf_plot_frames)."""

from argparse import ArgumentParser

from ..viz.plotting import plot_frames
from ..viz.utils import get_pipeline


def get_parser():
    parser = ArgumentParser()
    parser.add_argument("-p", "--path", default=".", help="search path")
    parser.add_argument("-e", "--every", type=int, default=1)
    parser.add_argument("-m", "--mode", default="select",
                        choices=["single", "all", "select"])
    return parser


def main(cli=True, every=1):
    mode, path = "single", "."
    if cli:
        args = get_parser().parse_args()
        path, every, mode = args.path, args.every, args.mode

    files = get_pipeline(path, mode=mode, name="sol.nc")
    for f in files:
        plot_frames(f, every=every)


if __name__ == "__main__":
    main()
