from .stencil import make_pallas_step, make_pallas_loop, pallas_supported  # noqa: F401
from .mixed_bc import make_mixed_loop, mixed_supported  # noqa: F401
