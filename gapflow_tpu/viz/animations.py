"""Animations of stored solution time series (1D, 1D+GP bands, 2D).

Parity: reference GaPFlow/viz/animations.py:47-430 (same figure layouts:
1D = 2x3 panels, +1 column of height/deformation for elastic runs;
1D-GP = 2x3 with uncertainty bands; 2D = 3x3 field maps).
"""

import os
import shutil

import numpy as np
import matplotlib
import matplotlib.pyplot as plt
from matplotlib import animation

from ..nc import NCReader
from .utils import (set_axes_labels, set_axes_limits, _plot_gp, in_notebook,
                    mpl_style_context)


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------

@mpl_style_context
def animate_1d(filename_sol, filename_topo, seconds=10., save=False):
    ani = _create_animation_1d(filename_sol, filename_topo)
    return _display_animation(ani, filename_sol, seconds=seconds, save=save)


@mpl_style_context
def animate_1d_gp(filename_sol, seconds=10., save=False, tol_p=None,
                  tol_t=None):
    ani = _create_animation_1d_gp(filename_sol, tol_p=tol_p, tol_t=tol_t)
    return _display_animation(ani, filename_sol, seconds=seconds, save=save)


@mpl_style_context
def animate_2d(filename_sol, seconds=10., save=False):
    ani = _create_animation_2d(filename_sol)
    return _display_animation(ani, filename_sol, seconds=seconds, save=save)


def _display_animation(ani, filename, seconds=10., save=False, show=True):
    """Save to mp4 (ffmpeg), display inline (notebook), or plt.show()."""
    if save:
        if shutil.which("ffmpeg") is None:
            print("ffmpeg not found; skipping mp4 save")
        else:
            outfile = os.path.join(os.path.dirname(filename), "animation.mp4")
            fps = max(ani._save_count / seconds, 1.)
            writer = animation.FFMpegWriter(fps=fps)
            ani.save(outfile, writer=writer)
            print(f"Saved animation to {outfile}")
            return ani

    if in_notebook():
        from IPython.display import HTML, display
        display(HTML(ani.to_jshtml()))
    elif show and matplotlib.get_backend().lower() != "agg":
        plt.show()
    return ani


# ---------------------------------------------------------------------------
# Builders
# ---------------------------------------------------------------------------

def _create_animation_1d(filename_sol, filename_topo):
    with NCReader(filename_sol) as nc:
        q_nc = nc.field("solution")
        p_nc = nc.field("pressure")
        tau_nc = nc.field("wall_stress_xz")
    with NCReader(filename_topo) as nc:
        topo_nc = nc.field("topography")

    nt, _, nx, ny = q_nc.shape
    x = np.linspace(0, 1, nx - 2)

    plot_topo = topo_nc.shape[0] > 1

    fig, ax = plt.subplots(2, 3 + int(plot_topo), figsize=(10, 4))

    color_q, color_p, color_t, color_h = "C0", "C1", "C2", "C3"

    (line_rho,) = ax[0, 0].plot([], [], color=color_q)
    (line_jx,) = ax[0, 1].plot([], [], color=color_q)
    (line_jy,) = ax[0, 2].plot([], [], color=color_q)
    (line_p,) = ax[1, 0].plot([], [], color=color_p)
    (line_tau_bot,) = ax[1, 1].plot([], [], color=color_t)
    (line_tau_top,) = ax[1, 2].plot([], [], color=color_t)

    lines = [line_rho, line_jx, line_jy, line_p, line_tau_bot, line_tau_top]

    if plot_topo:
        (line_h,) = ax[0, 3].plot([], [], color=color_h)
        (line_def,) = ax[1, 3].plot([], [], color=color_h)
        ax[0, 3].plot(x, topo_nc[0, 0, 1:-1, ny // 2], color=color_h,
                      linestyle="--", label="Initial")
        ax[0, 3].legend(loc="upper center")
        lines += [line_h, line_def]

    set_axes_limits(ax[0, 0], q_nc[:, 0, 1:-1, ny // 2], x=(0, 1), rel_tol=0.05)
    set_axes_limits(ax[0, 1], q_nc[:, 1, 1:-1, ny // 2], x=(0, 1), rel_tol=0.05)
    set_axes_limits(ax[0, 2], q_nc[:, 2, 1:-1, ny // 2], x=(0, 1), rel_tol=0.05)
    set_axes_limits(ax[1, 0], p_nc[1:, 1:-1, ny // 2], x=(0, 1), rel_tol=0.05)
    set_axes_limits(ax[1, 1], tau_nc[1:, 4, 1:-1, ny // 2], x=(0, 1), rel_tol=0.05)
    set_axes_limits(ax[1, 2], tau_nc[1:, 10, 1:-1, ny // 2], x=(0, 1), rel_tol=0.05)
    if plot_topo:
        set_axes_limits(ax[0, 3], topo_nc[:, 0, 1:-1, ny // 2], x=(0, 1), rel_tol=0.05)
        set_axes_limits(ax[1, 3], topo_nc[:, 3, 1:-1, ny // 2], x=(0, 1), rel_tol=0.05)

    set_axes_labels(ax, plot_topo)

    def init():
        for line in lines:
            line.set_data([], [])
        return tuple(lines)

    def update(i):
        line_rho.set_data(x, q_nc[i, 0, 1:-1, ny // 2])
        line_jx.set_data(x, q_nc[i, 1, 1:-1, ny // 2])
        line_jy.set_data(x, q_nc[i, 2, 1:-1, ny // 2])
        line_p.set_data(x, p_nc[i, 1:-1, ny // 2])
        line_tau_bot.set_data(x, tau_nc[i, 4, 1:-1, ny // 2])
        line_tau_top.set_data(x, tau_nc[i, 10, 1:-1, ny // 2])
        if plot_topo:
            line_h.set_data(x, topo_nc[i, 0, 1:-1, ny // 2])
            line_def.set_data(x, topo_nc[i, 3, 1:-1, ny // 2])
        return tuple(lines)

    return animation.FuncAnimation(fig, update, frames=nt, init_func=init,
                                   blit=True, interval=100, repeat=True)


def _create_animation_1d_gp(filename, tol_p=None, tol_t=None):
    if tol_p is not None:
        tol_p = np.sqrt(np.asarray(tol_p))
        tol_p_max = tol_p.max()
    else:
        tol_p_max = None
    if tol_t is not None:
        tol_t = np.sqrt(np.asarray(tol_t))
        tol_t_max = tol_t.max()
    else:
        tol_t_max = None

    with NCReader(filename) as nc:
        q_nc = nc.field("solution")
        p_nc = nc.field("pressure")
        pvar_nc = nc.field("pressure_var")
        tau_nc = nc.field("wall_stress_xz")
        tauvar_nc = nc.field("wall_stress_xz_var")

    nt, _, nx, ny = q_nc.shape
    x = np.arange(nx - 2) / (nx - 2)
    x = x + x[1] / 2.

    fig, ax = plt.subplots(2, 3, figsize=(12, 6))
    color_q, color_p, color_t = "C0", "C1", "C2"

    ax[0, 0].plot(x, q_nc[0, 0, 1:-1, ny // 2], color=color_q)
    ax[0, 1].plot(x, q_nc[0, 1, 1:-1, ny // 2], color=color_q)
    ax[0, 2].plot(x, q_nc[0, 2, 1:-1, ny // 2], color=color_q)

    def update_lines(i, q, p, vp, tau, vt):
        ax[0, 0].get_lines()[0].set_ydata(q[i, 0, 1:-1, ny // 2])
        ax[0, 1].get_lines()[0].set_ydata(q[i, 1, 1:-1, ny // 2])
        ax[0, 2].get_lines()[0].set_ydata(q[i, 2, 1:-1, ny // 2])

        for a in (ax[1, 0], ax[1, 1], ax[1, 2]):
            a.cla()

        _tol_p = tol_p[i] if tol_p is not None else None
        _tol_t = tol_t[i] if tol_t is not None else None
        _tol_p_max = tol_p_max if tol_p_max is not None \
            else np.sqrt(vp[i, 1:-1, ny // 2]).max()
        _tol_t_max = tol_t_max if tol_t_max is not None \
            else np.sqrt(vt[i, 1:-1, ny // 2]).max()

        _plot_gp(ax[1, 0], x, p[i, 1:-1, ny // 2], vp[i, 1:-1, ny // 2],
                 tol=_tol_p, color=color_p)
        _plot_gp(ax[1, 1], x, tau[i, 4, 1:-1, ny // 2], vt[i, 1:-1, ny // 2],
                 tol=_tol_t, color=color_t)
        _plot_gp(ax[1, 2], x, tau[i, 10, 1:-1, ny // 2], vt[i, 1:-1, ny // 2],
                 tol=_tol_t, color=color_t)

        set_axes_labels(ax)
        set_axes_limits(ax[1, 0], p[1:, 1:-1, ny // 2], tol=1.96 * _tol_p_max)
        set_axes_limits(ax[1, 1], tau[1:, 4, 1:-1, ny // 2], tol=1.96 * _tol_t_max)
        set_axes_limits(ax[1, 2], tau[1:, 10, 1:-1, ny // 2], tol=1.96 * _tol_t_max)

    update_lines(0, q_nc, p_nc, pvar_nc, tau_nc, tauvar_nc)

    set_axes_labels(ax)
    set_axes_limits(ax[0, 0], q_nc[:, 0, 1:-1, ny // 2])
    set_axes_limits(ax[0, 1], q_nc[:, 1, 1:-1, ny // 2])
    set_axes_limits(ax[0, 2], q_nc[:, 2, 1:-1, ny // 2])

    return animation.FuncAnimation(
        fig, update_lines, frames=nt,
        fargs=(q_nc, p_nc, pvar_nc, tau_nc, tauvar_nc),
        interval=100, repeat=True)


def _create_animation_2d(filename):
    with NCReader(filename) as nc:
        q_nc = nc.field("solution")
        p_nc = nc.field("pressure")
        tau_nc = nc.field("wall_stress_xz") + nc.field("wall_stress_yz")

    nt = q_nc.shape[0]

    fig, ax = plt.subplots(3, 3, figsize=(9, 9))
    imshow_args = {"origin": "lower", "extent": (0., 1., 0., 1.)}

    panels = [(q_nc[:, 0],), (q_nc[:, 1],), (q_nc[:, 2],),
              (p_nc,), (tau_nc[:, 4],), (tau_nc[:, 10],),
              (p_nc,), (tau_nc[:, 3],), (tau_nc[:, 9],)]
    titles = [r"$\rho$", r"$j_x$", r"$j_y$",
              r"$p$", r"$\tau_{xz}^{bot}$", r"$\tau_{xz}^{top}$",
              r"$p$", r"$\tau_{yz}^{bot}$", r"$\tau_{yz}^{top}$"]

    for a, (data,), title in zip(ax.flat, panels, titles):
        a.imshow(data[0, 1:-1, 1:-1].T, **imshow_args)
        a.set_title(title)
        a.set_xlabel(r"$x/L_x$")
        a.set_ylabel(r"$y/L_y$")

    def update_fields(i):
        for a, (data,) in zip(ax.flat, panels):
            im, = a.get_images()
            im.set_array(data[i, 1:-1, 1:-1].T)
            im.set_clim(vmin=data.min(), vmax=data.max())

    return animation.FuncAnimation(fig, update_fields, frames=nt,
                                   interval=100, repeat=True)
