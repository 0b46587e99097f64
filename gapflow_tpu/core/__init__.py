from .integrate import (predictor_corrector, source, hyperbolicFlux,
                        diffusiveFlux)  # noqa: F401
from .state import SimState  # noqa: F401
from .step import SolverConfig, make_det_step, make_pass_fn, make_run_loop  # noqa: F401
