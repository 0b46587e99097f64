"""The immutable simulation state pytree."""

from typing import NamedTuple

import jax.numpy as jnp


class SimState(NamedTuple):
    """Everything the fused solver step reads and writes.

    Array fields live on device; scalars are 0-d arrays so the whole state
    is one pytree that flows through ``jax.jit`` / ``lax.while_loop`` /
    ``shard_map`` without retracing.
    """

    q: jnp.ndarray          # (3, Nx+2, Ny+2)  conserved variables
    topo: jnp.ndarray       # (4, Nx+2, Ny+2)  h, dh/dx, dh/dy, deformation
    extra: jnp.ndarray      # (n_extra, Nx+2, Ny+2)  e.g. slip length
    dt: jnp.ndarray         # ()   current timestep
    step: jnp.ndarray       # ()   int step counter
    simtime: jnp.ndarray    # ()   physical time
    ekin_old: jnp.ndarray   # ()   kinetic energy of previous step
    residual: jnp.ndarray   # ()   latest convergence residual
    residual_buffer: jnp.ndarray  # (5,) trailing residuals
    valid: jnp.ndarray      # ()   bool: no NaN / negative density


def initial_state(q, topo, extra, dt, dtype=None):
    q = jnp.asarray(q, dtype=dtype)
    ekin = jnp.sum((q[1] ** 2 + q[2] ** 2) / q[0] / 2.)
    return SimState(
        q=q,
        topo=jnp.asarray(topo, dtype=q.dtype),
        extra=jnp.asarray(extra, dtype=q.dtype),
        dt=jnp.asarray(dt, dtype=q.dtype),
        step=jnp.asarray(0, dtype=jnp.int32),
        simtime=jnp.asarray(0., dtype=q.dtype),
        ekin_old=ekin,
        residual=jnp.asarray(1., dtype=q.dtype),
        residual_buffer=jnp.full((5,), jnp.inf, dtype=q.dtype).at[0].set(1.),
        valid=jnp.asarray(True),
    )
