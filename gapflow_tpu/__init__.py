"""gapflow-tpu: TPU-native gap-averaged lubrication flow with GP surrogates.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of GaPFlow
(reference: /root/reference/GaPFlow/__init__.py:25-37): a 2D finite-volume
solver for the compressible, gap-averaged Navier-Stokes (lubrication)
equations, closed either by analytic constitutive laws or by Gaussian-process
surrogates trained on-the-fly from molecular-dynamics data with
uncertainty-driven active learning.

Design stance (TPU-first):

- The solution state is one immutable pytree; a pure ``step(state) -> state``
  function is jitted end-to-end (single fused XLA program per timestep).
- Hot stencil path additionally available as a fused Pallas TPU kernel
  (:mod:`gapflow_tpu.ops.stencil`).
- Multi-chip scaling via ``shard_map`` over a 2D device mesh with
  ppermute halo exchange (:mod:`gapflow_tpu.parallel`).
- GP surrogate linear algebra is batched dense Cholesky on the MXU
  (:mod:`gapflow_tpu.models.gp`).

Float64 is enabled by default (the verification suite depends on it, like the
reference); set the environment variable ``GAPFLOW_X64=0`` before import to
run in float32 (recommended for TPU benchmark runs).
"""

import os

from jax import config as _jax_config

if os.environ.get("GAPFLOW_X64", "1") != "0":
    _jax_config.update("jax_enable_x64", True)

__version__ = "0.1.0"

try:
    from .db import Database  # noqa: F401, E402
    from .problem import Problem  # noqa: F401, E402
except ImportError:  # during incremental build-up
    pass
