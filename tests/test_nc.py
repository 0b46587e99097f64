"""NetCDF writer/reader: frame-append round trip."""

import numpy as np

from gapflow_tpu.fields import FieldCollection
from gapflow_tpu.nc import NCWriter, NCReader


def test_frame_roundtrip(tmp_path):
    fc = FieldCollection((10, 6))
    sol = fc.real_field("solution", (3,))
    fc.real_field("pressure")

    fname = str(tmp_path / "sol.nc")
    writer = NCWriter(fname, fc, field_names=["solution", "pressure"])

    frames = []
    for i in range(4):
        sol.p[...] = np.random.default_rng(i).normal(size=(3, 10, 6))
        fc.get_real_field("pressure").p[...] = float(i)
        frames.append(sol.p.copy())
        writer.append_frame().write()
    writer.close()

    with NCReader(fname) as nc:
        assert nc.num_frames() == 4
        q = nc.field("solution")
        assert q.shape == (4, 3, 10, 6)
        for i in range(4):
            np.testing.assert_allclose(q[i], frames[i])
        p_last = nc.field("pressure", frame=-1)
        np.testing.assert_allclose(p_last, 3.0)
