"""LAMMPS-compatible shim over the native nanomd engine.

Exposes a ``lammps`` namespace with a ``lammps`` class matching the API
surface the reference code and tests use (reference
GaPFlow/md/_lammps.py:36-125 and _vendor/lammps/core.py:127-886):
``lammps.lammps(name=..., cmdargs=[...])`` with ``file``, ``command``,
``version``, ``close``, ``has_package``, ``installed_packages``,
``has_mpi_support``, ``has_mpi4py``, ``get_os_info``, and a ``lib`` handle.
"""

from types import SimpleNamespace

from ._engine import Engine, _LIB_PATH


class _Lammps:
    """Drop-in replacement for the lammps.lammps Python class."""

    def __init__(self, name="mpi", cmdargs=None, nthreads=1):
        del name
        self._engine = Engine(nthreads=nthreads, cmdargs=cmdargs)
        self.lib = SimpleNamespace(_name=_LIB_PATH)

    def file(self, fname):
        self._engine.file(fname)

    def command(self, cmd):
        self._engine.command(cmd)

    def commands_list(self, cmds):
        for c in cmds:
            self._engine.command(c)

    def commands_string(self, s):
        for line in s.splitlines():
            self._engine.command(line)

    def version(self):
        return self._engine.version()

    def get_natoms(self):
        return self._engine.get_natoms()

    def extract_box(self):
        return self._engine.extract_box()

    def extract_global(self, name, dtype=None):
        del dtype
        return self._engine.extract_global(name)

    def gather_atoms(self, name="x", dtype=1, count=3):
        del dtype, count
        return self._engine.gather_atoms(name)

    def has_package(self, name):
        return self._engine.has_package(name)

    @property
    def installed_packages(self):
        return self._engine.installed_packages

    @property
    def has_mpi_support(self):
        return self._engine.has_mpi_support

    @property
    def has_mpi4py(self):
        return self._engine.has_mpi4py

    def get_os_info(self):
        return self._engine.get_os_info()

    def close(self):
        self._engine.close()


# module-style namespace: `from gapflow_tpu.md._lammps import lammps`
# then `lammps.lammps(...)`, as in the reference import pattern
lammps = SimpleNamespace(lammps=_Lammps)
