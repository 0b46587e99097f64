"""NetCDF writer/reader: frame-append round trip, both backends.

NETCDF4 (h5py/HDF5, netcdf-c dimension-scale conventions — the format the
reference's µGrid ``FileIONetCDF`` writes) and NETCDF3 (scipy classic).
"""

import numpy as np
import pytest

from gapflow_tpu.fields import FieldCollection
from gapflow_tpu.nc import NCWriter, NCReader, _is_hdf5

h5py = pytest.importorskip("h5py")


@pytest.mark.parametrize("fmt", ["NETCDF3", "NETCDF4"])
def test_frame_roundtrip(tmp_path, fmt):
    fc = FieldCollection((10, 6))
    sol = fc.real_field("solution", (3,))
    fc.real_field("pressure")

    fname = str(tmp_path / "sol.nc")
    writer = NCWriter(fname, fc, field_names=["solution", "pressure"],
                      format=fmt)

    frames = []
    for i in range(4):
        sol.p[...] = np.random.default_rng(i).normal(size=(3, 10, 6))
        fc.get_real_field("pressure").p[...] = float(i)
        frames.append(sol.p.copy())
        writer.append_frame().write()
    writer.close()

    assert _is_hdf5(fname) == (fmt == "NETCDF4")

    with NCReader(fname) as nc:
        assert nc.num_frames() == 4
        q = nc.field("solution")
        assert q.shape == (4, 3, 10, 6)
        for i in range(4):
            np.testing.assert_allclose(q[i], frames[i])
        p_last = nc.field("pressure", frame=-1)
        np.testing.assert_allclose(p_last, 3.0)


def test_netcdf4_conventions(tmp_path):
    """Written NC4 files carry the netcdf-c dimension-scale metadata that
    netCDF4-python requires (CLASS/NAME/_Netcdf4Dimid, attached scales)."""
    fc = FieldCollection((8, 5))
    fc.real_field("solution", (3,))
    fname = str(tmp_path / "sol.nc")
    w = NCWriter(fname, fc, field_names=["solution"], format="NETCDF4")
    w.append_frame().write()
    w.close()

    with h5py.File(fname, "r") as h5:
        for dim in ("frame", "comp_3", "grid_x", "grid_y"):
            ds = h5[dim]
            assert ds.attrs["CLASS"] == b"DIMENSION_SCALE"
            assert "_Netcdf4Dimid" in ds.attrs
        var = h5["solution"]
        assert var.shape == (1, 3, 8, 5)
        # every axis has its dimension scale attached
        assert [s.name.lstrip("/") for axis in var.dims for s, in
                [[axis[0]]]] == ["frame", "comp_3", "grid_x", "grid_y"]


def test_read_reference_style_netcdf4(tmp_path):
    """A NetCDF-4 file as produced by netCDF4-python/µGrid (independent
    HDF5 layout: scales written first, bare-dimension NAME strings, f8
    data) opens through NCReader — the reference interchange case
    (reference GaPFlow/problem.py:185-205)."""
    fname = str(tmp_path / "ref_sol.nc")
    rng = np.random.default_rng(42)
    q = rng.normal(size=(2, 3, 12, 7))

    with h5py.File(fname, "w") as h5:
        scales = {}
        for i, (dim, n) in enumerate(
                [("frame", 2), ("comp", 3), ("x", 12), ("y", 7)]):
            ds = h5.create_dataset(dim, shape=(n,), dtype="f4")
            ds.make_scale("This is a netCDF dimension but not a "
                          "netCDF variable.%10d" % n)
            ds.attrs["_Netcdf4Dimid"] = np.int32(i)
            scales[dim] = ds
        var = h5.create_dataset("solution", data=q, dtype="f8")
        for i, dim in enumerate(["frame", "comp", "x", "y"]):
            var.dims[i].attach_scale(scales[dim])

    with NCReader(fname) as nc:
        assert set(nc.variables) == {"solution"}
        assert nc.num_frames() == 2
        np.testing.assert_allclose(nc.field("solution"), q)
        np.testing.assert_allclose(nc.field("solution", frame=-1), q[-1])
