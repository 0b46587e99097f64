from .halo import (make_sharded_det_step, make_sharded_trajectory,  # noqa: F401
                   make_sharded_state_step, make_sharded_state_trajectory,
                   shard_problem_state, grid_mesh)
from .gp import make_sharded_gp_step, make_sharded_gp_trajectory  # noqa: F401
from . import multihost  # noqa: F401
