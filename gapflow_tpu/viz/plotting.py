"""Static plots of solution frames, histories, and gap topography.

Reads the NetCDF / CSV outputs written by :class:`gapflow_tpu.Problem`.
Parity: reference GaPFlow/viz/plotting.py:51-556 (same public entry points
and panel layouts; array indexing adapted to our NetCDF layout
``(frame, [components,] nx, ny)``).
"""

import numpy as np
import matplotlib.pyplot as plt

from ..config import read_history_csv
from ..nc import NCReader
from .utils import (_get_centerline_coords, set_axes_labels, _plot_gp,
                    mpl_style_context)


# ---------------------------------------------------------------------------
# Public entry points (used by the CLI tools)
# ---------------------------------------------------------------------------

@mpl_style_context
def plot_frame(file_list, dim=1, frame=-1, show=True):
    """Plot one stored frame (rho, jx, jy, p, tau panels) per input file."""
    if dim == 1:
        fig, ax = plt.subplots(2, 3, figsize=(10, 4))
        for fname in file_list:
            _plot_single_frame_1d(ax, fname, frame=frame)
    else:
        fig, ax = plt.subplots(3, 3, figsize=(9, 9))
        for fname in file_list:
            _plot_single_frame_2d(ax, fname, frame=frame)
    if show:
        plt.show()
    return fig, ax


@mpl_style_context
def plot_history(file_list, show=True):
    """Plot scalar histories (ekin, residual, vsound) of one or more runs."""
    fig, ax = plt.subplots(1, 3, figsize=(10, 3))
    for fname in file_list:
        _plot_history(ax, fname)
    if show:
        plt.show()
    return fig, ax


@mpl_style_context
def plot_height(file_list, dim=1, show_defo=False, show_pressure=False):
    """Plot the gap height profile of one or more topo.nc files."""
    out = []
    for fname in file_list:
        if dim == 1:
            out.append(_plot_height_1d(fname, show_defo=show_defo,
                                       show_pressure=show_pressure))
        else:
            out.append(_plot_height_2d(fname))
    plt.show()
    return out


def plot_frames(filename, every=1):
    fig, ax = _plot_multiple_frames_1d(filename, every=every)
    plt.show()
    return fig, ax


# ---------------------------------------------------------------------------
# Topography plots
# ---------------------------------------------------------------------------

def _plot_height_1d(fname_topo, show_defo=False, show_pressure=False):
    with NCReader(fname_topo) as nc:
        topo = nc.field("topography")

    fname_sol = fname_topo.replace("topo.nc", "sol.nc")
    press = None
    if show_pressure:
        try:
            with NCReader(fname_sol) as nc:
                press = nc.field("pressure", frame=-1)
        except (FileNotFoundError, OSError):
            press = None

    return _plot_height_1d_from_field(topo[-1], press,
                                      show_defo=show_defo,
                                      show_pressure=show_pressure,
                                      topo0=topo[0])


def _plot_height_1d_from_field(topo, pressure=None, show_defo=False,
                               show_pressure=False, topo0=None):
    topo = np.asarray(topo)
    ny = topo.shape[-1]
    x = _get_centerline_coords(topo.shape[-2], ny)

    nrows = 1 + int(show_defo) + int(show_pressure)
    fig, axes = plt.subplots(nrows, 1, figsize=(6, 2.2 * nrows), squeeze=False)
    axes = axes[:, 0]

    i = 0
    axes[i].plot(x, topo[0, 1:-1, ny // 2], color="C3", label="height")
    if topo0 is not None and show_defo:
        axes[i].plot(x, np.asarray(topo0)[0, 1:-1, ny // 2], "--",
                     color="C3", label="undeformed")
        axes[i].legend()
    axes[i].set_ylabel(r"$h$")

    if show_defo:
        i += 1
        axes[i].plot(x, topo[3, 1:-1, ny // 2], color="C4")
        axes[i].set_ylabel(r"$u_{el}$")

    if show_pressure and pressure is not None:
        i += 1
        axes[i].plot(x, np.asarray(pressure)[1:-1, ny // 2], color="C1")
        axes[i].set_ylabel(r"$p$")
    elif show_pressure:
        i += 1
        axes[i].set_ylabel(r"$p$ (no data)")

    axes[-1].set_xlabel(r"$x/L_x$")
    return fig, list(axes)


def _plot_height_2d(filename):
    with NCReader(filename) as nc:
        topo = nc.field("topography", frame=-1)
    return _plot_height_2d_from_field(topo)


def _plot_height_2d_from_field(topo):
    topo = np.asarray(topo)
    fig, axes = plt.subplots(1, 3, figsize=(10, 3))
    titles = [r"$h$", r"$\partial h/\partial x$", r"$\partial h/\partial y$"]
    for i, (a, t) in enumerate(zip(axes, titles)):
        im = a.imshow(topo[i, 1:-1, 1:-1].T, origin="lower",
                      extent=(0., 1., 0., 1.))
        fig.colorbar(im, ax=a)
        a.set_title(t)
    return fig, list(axes)


# ---------------------------------------------------------------------------
# Solution frame plots
# ---------------------------------------------------------------------------

def _read_sol(filename):
    with NCReader(filename) as nc:
        q = nc.field("solution")
        p = nc.field("pressure")
        tau = nc.field("wall_stress_xz")
    return q, p, tau


def _plot_single_frame_1d(ax, filename, frame=-1, disc=None):
    q, p, tau = _read_sol(filename)
    ny = q.shape[-1]
    x = _get_centerline_coords(q.shape[-2], ny, disc)

    ax[0, 0].plot(x, q[frame, 0, 1:-1, ny // 2], color="C0")
    ax[0, 1].plot(x, q[frame, 1, 1:-1, ny // 2], color="C0")
    ax[0, 2].plot(x, q[frame, 2, 1:-1, ny // 2], color="C0")
    ax[1, 0].plot(x, p[frame, 1:-1, ny // 2], color="C1")
    ax[1, 1].plot(x, tau[frame, 4, 1:-1, ny // 2], color="C2")
    ax[1, 2].plot(x, tau[frame, 10, 1:-1, ny // 2], color="C2")
    set_axes_labels(ax)
    return ax


def _plot_sol_from_field_1d(q, p, tau_bot, tau_top, var_press=None,
                            var_shear=None, var_tol_press=None,
                            var_tol_shear=None, ax=None):
    q, p = np.asarray(q), np.asarray(p)
    ny = q.shape[-1]
    x = _get_centerline_coords(q.shape[-2], ny)

    if ax is None:
        _, ax = plt.subplots(2, 3, figsize=(10, 4))

    for i in range(3):
        ax[0, i].plot(x, q[i, 1:-1, ny // 2], color="C0")

    if var_press is not None:
        _plot_gp(ax[1, 0], x, p[1:-1, ny // 2],
                 np.asarray(var_press)[1:-1, ny // 2],
                 tol=np.sqrt(float(var_tol_press)) if var_tol_press is not None
                 else None, color="C1")
    else:
        ax[1, 0].plot(x, p[1:-1, ny // 2], color="C1")

    for a, tau in ((ax[1, 1], tau_bot), (ax[1, 2], tau_top)):
        tau = np.asarray(tau)
        if var_shear is not None:
            _plot_gp(a, x, tau[1:-1, ny // 2],
                     np.asarray(var_shear)[1:-1, ny // 2],
                     tol=np.sqrt(float(var_tol_shear))
                     if var_tol_shear is not None else None, color="C2")
        else:
            a.plot(x, tau[1:-1, ny // 2], color="C2")

    set_axes_labels(ax)
    return ax


def _plot_single_frame_2d(ax, filename, frame=-1, disc=None):
    with NCReader(filename) as nc:
        q = nc.field("solution", frame=frame)
        p = nc.field("pressure", frame=frame)
        tau_xz = nc.field("wall_stress_xz", frame=frame)
        tau_yz = nc.field("wall_stress_yz", frame=frame)
    return _plot_sol_from_field_2d(q, p,
                                   tau_xz[4], tau_xz[10],
                                   tau_yz[3], tau_yz[9], ax=ax)


def _plot_sol_from_field_2d(q, p, tau_xz_bot, tau_xz_top, tau_yz_bot,
                            tau_yz_top, var_press=None, var_shear_xz=None,
                            var_shear_yz=None, ax=None):
    del var_press, var_shear_xz, var_shear_yz
    q, p = np.asarray(q), np.asarray(p)

    if ax is None:
        _, ax = plt.subplots(3, 3, figsize=(9, 9))

    panels = [q[0], q[1], q[2],
              p, np.asarray(tau_xz_bot), np.asarray(tau_xz_top),
              p, np.asarray(tau_yz_bot), np.asarray(tau_yz_top)]
    titles = [r"$\rho$", r"$j_x$", r"$j_y$",
              r"$p$", r"$\tau_{xz}^{bot}$", r"$\tau_{xz}^{top}$",
              r"$p$", r"$\tau_{yz}^{bot}$", r"$\tau_{yz}^{top}$"]

    for a, field, title in zip(np.asarray(ax).flat, panels, titles):
        a.imshow(field[1:-1, 1:-1].T, origin="lower", extent=(0., 1., 0., 1.))
        a.set_title(title)
        a.set_xlabel(r"$x/L_x$")
        a.set_ylabel(r"$y/L_y$")
    return ax


def _plot_multiple_frames_1d(filename, every=1):
    """One line per stored frame in each of the 6 standard panels."""
    q, p, tau = _read_sol(filename)
    ny = q.shape[-1]
    x = _get_centerline_coords(q.shape[-2], ny)

    fig, ax = plt.subplots(2, 3, figsize=(10, 4))

    frames = range(0, q.shape[0], every)
    for i in frames:
        shade = str(0.8 * (1. - i / max(q.shape[0] - 1, 1)))
        ax[0, 0].plot(x, q[i, 0, 1:-1, ny // 2], color=shade)
        ax[0, 1].plot(x, q[i, 1, 1:-1, ny // 2], color=shade)
        ax[0, 2].plot(x, q[i, 2, 1:-1, ny // 2], color=shade)
        ax[1, 0].plot(x, p[i, 1:-1, ny // 2], color=shade)
        ax[1, 1].plot(x, tau[i, 4, 1:-1, ny // 2], color=shade)
        ax[1, 2].plot(x, tau[i, 10, 1:-1, ny // 2], color=shade)

    set_axes_labels(ax)
    return fig, ax


# ---------------------------------------------------------------------------
# History plots
# ---------------------------------------------------------------------------

def _plot_history(ax, filename="history.csv"):
    hist = read_history_csv(filename)
    t = hist["time"]
    ax[0].plot(t, hist["ekin"])
    ax[0].set_ylabel(r"$E_{kin}$")
    ax[1].semilogy(t, hist["residual"])
    ax[1].set_ylabel("residual")
    ax[2].plot(t, hist["vsound"])
    ax[2].set_ylabel(r"$c$")
    for a in ax:
        a.set_xlabel(r"$t$")
    return ax


def _plot_gp_history(ax, filename="gp_zz.csv", index=0):
    hist = read_history_csv(filename)
    steps = hist["step"]
    ax[0].plot(steps, hist["database_size"])
    ax[0].set_ylabel("DB size")
    ax[1].semilogy(steps, hist["maximum_variance"], label="max var")
    ax[1].semilogy(steps, hist["variance_tol"], "--", label="tol")
    ax[1].set_ylabel("variance")
    ax[1].legend()
    ls_keys = [k for k in hist if k.startswith("lengthscale")]
    for k in ls_keys:
        ax[2].semilogy(steps, hist[k], label=k)
    ax[2].set_ylabel("lengthscales")
    ax[2].legend()
    for a in ax:
        a.set_xlabel("step")
    return ax
