"""CLI: animate a stored 1D run, with GP bands if present (gpf_animate1d)."""

import os
from argparse import ArgumentParser

import numpy as np

from ..config import read_history_csv
from ..viz.animations import animate_1d, animate_1d_gp
from ..viz.utils import get_pipeline


def get_parser():
    parser = ArgumentParser()
    parser.add_argument("-p", "--path", default=".", help="search path")
    parser.add_argument("-s", "--save", action="store_true")
    parser.add_argument("-m", "--mode", default="single",
                        choices=["single", "all", "select"])
    return parser


def main(cli=True, path=".", save=False, mode="single"):
    if cli:
        args = get_parser().parse_args()
        path, save, mode = args.path, args.save, args.mode

    files = get_pipeline(path, mode=mode, name="sol.nc")
    for fname_sol in files:
        outdir = os.path.dirname(fname_sol)
        gp_p = os.path.join(outdir, "gp_zz.csv")
        gp_s = os.path.join(outdir, "gp_xz.csv")

        if os.path.exists(gp_p) or os.path.exists(gp_s):
            tol_p = tol_t = None
            if os.path.exists(gp_p):
                tol_p = np.array(read_history_csv(gp_p)["variance_tol"])
            if os.path.exists(gp_s):
                tol_t = np.array(read_history_csv(gp_s)["variance_tol"])
            animate_1d_gp(fname_sol, save=save, tol_p=tol_p, tol_t=tol_t)
        else:
            fname_topo = os.path.join(outdir, "topo.nc")
            animate_1d(fname_sol, fname_topo, save=save)


if __name__ == "__main__":
    main()
