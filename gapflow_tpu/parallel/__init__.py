from .halo import make_sharded_det_step, make_sharded_trajectory, grid_mesh  # noqa: F401
from . import multihost  # noqa: F401
