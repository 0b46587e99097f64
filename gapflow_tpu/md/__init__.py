from .mock import Mock  # noqa: F401
from .lj import LennardJones  # noqa: F401
from .mol import GoldAlkane  # noqa: F401
