"""Smoke-check the native MD engine build and capability surface."""

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

from gapflow_tpu.md._lammps import lammps

lmp = lammps.lammps(name="mpi", cmdargs=["-log", "none"])
print("Engine version:  ", lmp.version())
print("OS:              ", lmp.get_os_info())
print("Shared library:  ", lmp.lib._name)
print("mpi4py:          ", lmp.has_mpi4py)
print("Installed packages:", lmp.installed_packages)
lmp.close()
