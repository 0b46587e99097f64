"""CLI: plot the gap height profile of stored runs (gpf_plot_height)."""

from argparse import ArgumentParser

from ..viz.plotting import plot_height
from ..viz.utils import get_pipeline


def get_parser():
    parser = ArgumentParser()
    parser.add_argument("-p", "--path", default=".", help="search path")
    parser.add_argument("-d", "--dim", type=int, default=1, choices=[1, 2])
    parser.add_argument("--defo", action="store_true", help="show deformation")
    parser.add_argument("--pressure", action="store_true", help="show pressure")
    parser.add_argument("-m", "--mode", default="select",
                        choices=["single", "all", "select"])
    return parser


def main(cli=True, path=".", dim=1, show_defo=False, show_pressure=False):
    if cli:
        args = get_parser().parse_args()
        path, dim = args.path, args.dim
        show_defo, show_pressure = args.defo, args.pressure
        mode = args.mode
    else:
        mode = "single"

    files = get_pipeline(path, mode=mode, name="topo.nc")
    if files:
        plot_height(files, dim=dim, show_defo=show_defo,
                    show_pressure=show_pressure)


if __name__ == "__main__":
    main()
