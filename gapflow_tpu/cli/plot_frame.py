"""CLI: plot a single stored solution frame (gpf_plot_frame)."""

from argparse import ArgumentParser

from ..viz.plotting import plot_frame
from ..viz.utils import get_pipeline


def get_parser():
    parser = ArgumentParser()
    parser.add_argument("-p", "--path", default=".", help="search path")
    parser.add_argument("-d", "--dim", type=int, default=1, choices=[1, 2])
    parser.add_argument("-f", "--frame", type=int, default=-1)
    parser.add_argument("-m", "--mode", default="select",
                        choices=["single", "all", "select"])
    return parser


def main(cli=True, dim=1, frame=-1):
    mode = "single"
    path = "."
    if cli:
        args = get_parser().parse_args()
        path, dim, frame, mode = args.path, args.dim, args.frame, args.mode

    files = get_pipeline(path, mode=mode, name="sol.nc")
    if files:
        plot_frame(files, dim=dim, frame=frame)


if __name__ == "__main__":
    main()
