"""Shared visualization helpers: pipeline discovery, axes styling, GP bands.

Parity: reference GaPFlow/viz/utils.py:36-186.
"""

import os
from functools import wraps

import numpy as np


def get_pipeline(path=".", silent=False, mode="select", name="sol.nc"):
    """Find simulation output directories containing ``name``.

    mode='single': newest match; 'all': every match; 'select': interactive.
    Returns a list of file paths.
    """
    matches = []
    for root, _, files in os.walk(path):
        if name in files:
            matches.append(os.path.join(root, name))
    matches.sort(key=os.path.getmtime)

    if not matches:
        if not silent:
            print(f"No '{name}' found below {path}")
        return []

    if mode == "single":
        return [matches[-1]]
    if mode == "all":
        return matches

    # interactive selection
    for i, m in enumerate(matches):
        print(f"[{i}] {m}")
    try:
        choice = input("Select dataset(s) (comma-separated, empty=last): ")
    except EOFError:
        choice = ""
    if not choice.strip():
        return [matches[-1]]
    return [matches[int(c)] for c in choice.split(",")]


def _get_centerline_coords(nx, ny, disc=None):
    """Normalized cell-center x coordinates for 1D line plots."""
    del ny, disc
    x = np.arange(nx - 2) / (nx - 2)
    return x + x[1] / 2. if nx > 3 else x


_LABELS_1D = [r"$\rho$", r"$j_x$", r"$j_y$",
              r"$p$", r"$\tau_{xz}^{bot}$", r"$\tau_{xz}^{top}$"]


def set_axes_labels(ax, bDef=False):
    labels = list(_LABELS_1D)
    axes = np.asarray(ax)
    if bDef and axes.shape[-1] == 4:
        flat = [axes[0, 0], axes[0, 1], axes[0, 2],
                axes[1, 0], axes[1, 1], axes[1, 2]]
        axes[0, 3].set_ylabel(r"$h$")
        axes[1, 3].set_ylabel(r"$u_{el}$")
    else:
        flat = list(axes.flat)
    for a, lab in zip(flat, labels):
        a.set_ylabel(lab)
        a.set_xlabel(r"$x/L_x$")


def set_axes_limits(ax, q, tol=None, x=None, rel_tol=None):
    if x is not None:
        ax.set_xlim(x[0], x[1])

    q_min, q_max = np.min(q), np.max(q)
    if np.isclose(q_min, q_max):
        if np.isclose(q_min, 0.):
            q_min, q_max = -1., 1.
        else:
            q_min, q_max = 0.95 * q_min, 1.05 * q_max

    if tol is not None:
        q_min -= tol
        q_max += tol
    if rel_tol is not None:
        delta = rel_tol * (q_max - q_min)
        q_min -= delta
        q_max += delta

    ax.set_ylim(q_min, q_max)


def _plot_gp(ax, x, mean, var, tol=None, color="C0"):
    """Mean line with 95% band; dashed lines mark the variance tolerance."""
    band = 1.96 * np.sqrt(var)
    ax.fill_between(x, mean + band, mean - band, color=color, lw=0., alpha=0.3)
    ax.plot(x, mean, color=color)
    if tol is not None:
        ax.plot(x, mean + 1.96 * tol, "--", color=color)
        ax.plot(x, mean - 1.96 * tol, "--", color=color)


def mpl_style_context(func):
    """Apply the package plot style inside the wrapped function."""
    import matplotlib.pyplot as plt

    style = os.path.join(os.path.dirname(__file__), "gapflow.mplstyle")

    @wraps(func)
    def wrapper(*args, **kwargs):
        if os.path.exists(style):
            with plt.style.context(style):
                return func(*args, **kwargs)
        return func(*args, **kwargs)

    return wrapper


def in_notebook():
    try:
        from IPython import get_ipython
        shell = get_ipython()
        return shell is not None and "IPKernelApp" in shell.config
    except Exception:
        return False
