from .stress import Pressure, WallStress, BulkStress  # noqa: F401
