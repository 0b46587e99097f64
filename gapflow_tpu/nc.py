"""Frame-appending NetCDF output for grid fields.

Replaces the reference's µGrid ``FileIONetCDF`` (reference
GaPFlow/problem.py:185-205) with a small writer/reader over
``scipy.io.netcdf_file`` (NetCDF-3 classic, no extra dependencies).

Layout: each registered field becomes a variable with dimensions
``(frame, [components,] nx, ny)`` where frame is the unlimited record
dimension.  The viz/CLI layer and the tests read files through
:class:`NCReader`.
"""

import numpy as np
from scipy.io import netcdf_file


class NCWriter:
    """Append-per-frame NetCDF writer for a set of named fields."""

    def __init__(self, fname, field_collection=None, field_names=None):
        self._fname = fname
        self._fc = None
        self._names = []
        self._nc = netcdf_file(fname, "w", version=2)
        self._dims = {}
        self._vars = {}
        self._nframes = 0
        if field_collection is not None:
            self.register_field_collection(field_collection, field_names)

    def register_field_collection(self, fc, field_names=None):
        self._fc = fc
        names = field_names if field_names is not None else fc.field_names()
        nx, ny = fc.nb_grid_pts
        self._ensure_dim("frame", None)
        self._ensure_dim("grid_x", nx)
        self._ensure_dim("grid_y", ny)
        for name in names:
            field = fc.get_real_field(name)
            comp_shape = field.p.shape[:-2]
            dims = ["frame"]
            for i, c in enumerate(comp_shape):
                dim_name = f"comp_{c}"
                self._ensure_dim(dim_name, c)
                dims.append(dim_name)
            dims += ["grid_x", "grid_y"]
            var = self._nc.createVariable(name, "d", tuple(dims))
            self._vars[name] = var
            self._names.append(name)

    def _ensure_dim(self, name, size):
        if name not in self._dims:
            self._nc.createDimension(name, size)
            self._dims[name] = size

    def append_frame(self):
        """Stage a new frame; call ``.write()`` on the result to commit."""
        return _Frame(self)

    def _write_frame(self):
        i = self._nframes
        for name in self._names:
            arr = np.asarray(self._fc.get_real_field(name).p, dtype=np.float64)
            self._vars[name][i, ...] = arr
        self._nframes += 1
        self._nc.flush()

    def close(self):
        if self._nc is not None:
            self._nc.close()
            self._nc = None


class _Frame:
    def __init__(self, writer):
        self._writer = writer

    def write(self):
        self._writer._write_frame()


class NCReader:
    """Read frames written by :class:`NCWriter` (context-manager friendly)."""

    def __init__(self, fname):
        self._nc = netcdf_file(fname, "r", mmap=False)

    @property
    def variables(self):
        return self._nc.variables

    def field(self, name, frame=None):
        data = self._nc.variables[name].data
        if frame is None:
            return np.array(data)
        return np.array(data[frame])

    def num_frames(self, name=None):
        if name is None:
            name = next(iter(self._nc.variables))
        return self._nc.variables[name].shape[0]

    def close(self):
        self._nc.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
