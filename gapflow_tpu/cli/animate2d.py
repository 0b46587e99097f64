"""CLI: animate a stored 2D run (gpf_animate2d)."""

from argparse import ArgumentParser

from ..viz.animations import animate_2d
from ..viz.utils import get_pipeline


def get_parser():
    parser = ArgumentParser()
    parser.add_argument("-p", "--path", default=".", help="search path")
    parser.add_argument("-s", "--save", action="store_true")
    parser.add_argument("-m", "--mode", default="single",
                        choices=["single", "all", "select"])
    return parser


def main():
    args = get_parser().parse_args()
    files = get_pipeline(args.path, mode=args.mode, name="sol.nc")
    for fname in files:
        animate_2d(fname, save=args.save)


if __name__ == "__main__":
    main()
