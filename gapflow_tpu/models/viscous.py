"""Viscous stress tensor closures (public API over generated expressions).

Closed-form (generalized) Newtonian stress tensor components at the bottom
wall, top wall, and averaged across the gap, as functions of the gap-averaged
state ``q = (rho, jx, jy)``, the gap profile ``h = (h, dh/dx, dh/dy)``, wall
velocities, viscosities and slip length.

The expressions are symbolically derived (codegen/derive_closures.py) from
the lubrication velocity-profile ansatz; this module provides the slip-mode
dispatch and array plumbing.

Parity: reference GaPFlow/models/viscous.py:37-786.  Matching the reference
dispatch, ``slip="top"`` (no-slip bottom / slip top, the solver default) uses
the slip-top closure; any other value uses the slip-both closure (which
reduces to no-slip for Ls=0).  All functions are jit/vmap safe.
"""

import jax.numpy as jnp

from . import _closures as _C

__all__ = ["stress_bottom", "stress_top", "stress_avg"]


def _unpack(q, h, dqx, dqy):
    if dqx is None and dqy is None:
        # hot path: no state gradients -> use the specialized closures
        return (q[0], q[1], q[2], h[0], h[1], h[2]), True
    if dqx is None:
        dqx = jnp.zeros_like(jnp.asarray(q))
    if dqy is None:
        dqy = jnp.zeros_like(jnp.asarray(q))
    return (q[0], q[1], q[2], h[0], h[1], h[2],
            dqx[0], dqx[1], dqx[2], dqy[0], dqy[1], dqy[2]), False


def _normalize_ls(Ls, q):
    """Allow the slip length to come in as the (1, nx, ny) extra field."""
    Ls = jnp.asarray(Ls)
    q0 = jnp.asarray(q[0])
    if Ls.ndim == q0.ndim + 1 and Ls.shape[0] == 1:
        Ls = Ls[0]
    return Ls


def _stack6(parts, like):
    shape = jnp.shape(like)
    return jnp.stack([jnp.broadcast_to(jnp.asarray(p, dtype=jnp.result_type(like)), shape)
                      for p in parts])


def _dispatch(table, slip, nodq):
    # Reference-compatible: 'top' is special-cased, everything else takes the
    # slip-both expressions (identical to no-slip when Ls == 0).
    mode = "top" if slip == "top" else "both"
    return table[mode + "_nodq" if nodq else mode]


_MODES = ("none", "top", "bottom", "both")
_BOTTOM = {m + s: getattr(_C, f"_tau_bottom_{m}{s and '_nodq'}")
           for m in _MODES for s in ("", "_nodq")}
_TOP = {m + s: getattr(_C, f"_tau_top_{m}{s and '_nodq'}")
        for m in _MODES for s in ("", "_nodq")}
_AVG = {m + s: getattr(_C, f"_tau_avg_{m}{s and '_nodq'}")
        for m in _MODES for s in ("", "_nodq")}


def stress_bottom(q, h, U, V, eta, zeta, Ls, dqx=None, dqy=None, slip="top"):
    """Viscous stress tensor at the bottom wall, Voigt order (xx,yy,zz,yz,xz,xy).

    ``q``: (3, ...) gap-averaged state; ``h``: (3, ...) height and slopes;
    ``eta``/``zeta``: shear/bulk viscosity (scalar or field); ``Ls``: slip
    length (scalar or field).  Returns shape (6, ...).
    """
    Ls = _normalize_ls(Ls, q)
    args, nodq = _unpack(q, h, dqx, dqy)
    fn = _dispatch(_BOTTOM, slip, nodq)
    parts = fn(*args, U, V, eta, zeta, Ls)
    return _stack6(parts, q[0] + h[0] + Ls * 0)


def stress_top(q, h, U, V, eta, zeta, Ls, dqx=None, dqy=None, slip="top"):
    """Viscous stress tensor at the top wall, Voigt order (xx,yy,zz,yz,xz,xy)."""
    Ls = _normalize_ls(Ls, q)
    args, nodq = _unpack(q, h, dqx, dqy)
    fn = _dispatch(_TOP, slip, nodq)
    parts = fn(*args, U, V, eta, zeta, Ls)
    return _stack6(parts, q[0] + h[0] + Ls * 0)


def stress_avg(q, h, U, V, eta, zeta, Ls, dqx=None, dqy=None, slip="top"):
    """Gap-averaged in-plane viscous stress, component order (xx, yy, xy).

    Returns shape (3, ...).  For slip modes other than 'top'/'both' the
    reference returns zeros; we do the same for drop-in parity.
    """
    Ls = _normalize_ls(Ls, q)
    like = q[0] + h[0] + Ls * 0
    if slip not in ("top", "both"):
        return jnp.zeros((3,) + jnp.shape(like), dtype=jnp.result_type(like))
    args, nodq = _unpack(q, h, dqx, dqy)
    t = _AVG[slip + ("_nodq" if nodq else "")](*args, U, V, eta, zeta, Ls)
    return _stack6((t[0], t[1], t[5]), like)
