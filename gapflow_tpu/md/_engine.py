"""ctypes binding to the native nanomd engine, with build-on-demand.

The shared library is compiled from ``gapflow_tpu/native/nanomd.cpp`` the
first time an :class:`Engine` is constructed (requires g++ + make).

Parity surface: the methods GaPFlow actually uses from its vendored LAMMPS
wrapper (reference GaPFlow/_vendor/lammps/core.py:127-886 — ``file``,
``command``, ``version``, ``close``, package queries).
"""

import ctypes
import os
import subprocess

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnanomd.so")

_lib = None


def _build_library():
    subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                   stdout=subprocess.DEVNULL)


def _load_library():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _build_library()

    lib = ctypes.CDLL(_LIB_PATH, mode=ctypes.RTLD_GLOBAL)
    lib.nanomd_create.restype = ctypes.c_void_p
    lib.nanomd_create.argtypes = [ctypes.c_int]
    lib.nanomd_destroy.argtypes = [ctypes.c_void_p]
    lib.nanomd_command.restype = ctypes.c_int
    lib.nanomd_command.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.nanomd_file.restype = ctypes.c_int
    lib.nanomd_file.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.nanomd_version.restype = ctypes.c_char_p
    lib.nanomd_has_package.restype = ctypes.c_int
    lib.nanomd_has_package.argtypes = [ctypes.c_char_p]
    lib.nanomd_last_error.restype = ctypes.c_char_p
    lib.nanomd_last_error.argtypes = [ctypes.c_void_p]
    lib.nanomd_natoms.restype = ctypes.c_long
    lib.nanomd_natoms.argtypes = [ctypes.c_void_p]
    lib.nanomd_box.argtypes = [ctypes.c_void_p,
                               ctypes.POINTER(ctypes.c_double)]
    lib.nanomd_global.restype = ctypes.c_double
    lib.nanomd_global.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.nanomd_gather.restype = ctypes.c_int
    lib.nanomd_gather.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_double)]
    _lib = lib
    return lib


class EngineError(RuntimeError):
    pass


class Engine:
    """A native MD engine instance (confined-LJ workload)."""

    def __init__(self, nthreads=1, cmdargs=None):
        self._lib = _load_library()
        self._handle = self._lib.nanomd_create(int(nthreads))
        self.lib_path = _LIB_PATH
        if cmdargs:
            # accept lammps-style ['-log', 'none', '-screen', 'none']
            args = list(cmdargs)
            for i, a in enumerate(args):
                if a == "-log" and i + 1 < len(args):
                    self.command(f"log {args[i + 1]}")

    def command(self, line):
        rc = self._lib.nanomd_command(self._handle, line.encode())
        if rc != 0:
            raise EngineError(self._last_error())

    def file(self, path):
        rc = self._lib.nanomd_file(self._handle, path.encode())
        if rc != 0:
            raise EngineError(self._last_error())

    def _last_error(self):
        return self._lib.nanomd_last_error(self._handle).decode()

    def version(self):
        return self._lib.nanomd_version().decode()

    def get_natoms(self):
        return int(self._lib.nanomd_natoms(self._handle))

    def extract_box(self):
        """((xlo, ylo, zlo), (xhi, yhi, zhi)) of the current system."""
        buf = (ctypes.c_double * 6)()
        self._lib.nanomd_box(self._handle, buf)
        return (buf[0], buf[2], buf[4]), (buf[1], buf[3], buf[5])

    def extract_global(self, name):
        """Scalar engine state / deck variable by name."""
        return float(self._lib.nanomd_global(self._handle, name.encode()))

    def gather_atoms(self, name="x"):
        """Per-atom data ('x', 'v' or 'f') as an (natoms, 3) numpy array."""
        import numpy as np
        n = self.get_natoms()
        buf = (ctypes.c_double * (3 * n))()
        rc = self._lib.nanomd_gather(self._handle, name.encode(), buf)
        if rc != 0:
            raise EngineError(f"unknown per-atom field: {name}")
        return np.ctypeslib.as_array(buf).reshape(n, 3).copy()

    def has_package(self, name):
        return bool(self._lib.nanomd_has_package(name.encode()))

    @property
    def installed_packages(self):
        return [p for p in ("LJ", "EXTRA-FIX", "WALLS")
                if self.has_package(p)]

    @property
    def has_mpi_support(self):
        return False  # process-level parallelism lives in runner.py

    @property
    def has_mpi4py(self):
        from .runner import PARALLEL
        return PARALLEL

    def get_os_info(self):
        import platform
        return f"{platform.system()} {platform.release()}"

    def close(self):
        if self._handle is not None:
            self._lib.nanomd_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
