"""Moltemplate helpers: MPI-grid heuristic, .lt parsing, FCC slab builder.

Mirrors reference tests/test_moltemplate.py:30-53 plus checks on our
ASE-free FCC construction.
"""

import os

import numpy as np
import pytest

from gapflow_tpu.md.moltemplate import (_get_MPI_grid, _read_coords_from_lt,
                                        _create_fcc_wall, make_fcc_box)


@pytest.mark.parametrize("Na,size,max_cpu", [(1000, 2, 4),
                                             (30_000, 3, 30),
                                             (30_000, 3, 3),
                                             (100_000, 4, 12),
                                             (500_000, 4, 24),
                                             (1_000_000, 5, 30)])
def test_processors_grid(Na, size, max_cpu):
    nx, ny, nz = _get_MPI_grid(Na, size, max_cpu)
    assert nx * ny * nz <= max_cpu


@pytest.mark.parametrize("fname,expected", [("pentane.lt", 5),
                                            ("decane.lt", 10),
                                            ("hexadecane.lt", 16)])
def test_coords_from_lt(fname, expected):
    path = os.path.join(os.path.dirname(__file__), "..", "examples", "lmp",
                        "mol", "moltemplate_files", fname)
    coords = _read_coords_from_lt(path)
    assert coords.shape == (expected, 3)


def test_fcc_box_density():
    """Generated FCC box has 4 atoms per conventional cell volume."""
    a = 4.08
    slab = make_fcc_box((1, 1, 0), (-1, 1, 2), (1, -1, 1), (6, 4, 2), a=a)
    lx, ly, lz = slab.get_cell_lengths()
    expected = 4 * lx * ly * lz / a ** 3
    n = slab.get_global_number_of_atoms()
    assert abs(n - expected) / expected < 1e-6

    # all atoms inside the box
    pos = slab.get_positions()
    assert np.all(pos >= -1e-9)
    assert np.all(pos <= np.array([lx, ly, lz]) + 1e-9)


def test_fcc_nearest_neighbor_distance():
    """Nearest-neighbor distance equals a/sqrt(2) regardless of orientation."""
    a = 4.08
    slab = make_fcc_box((1, 1, 0), (-1, 1, 2), (1, -1, 1), (4, 3, 1), a=a)
    pos = slab.get_positions()
    d = np.linalg.norm(pos[None, :, :] - pos[:, None, :], axis=-1)
    d[d < 1e-9] = np.inf
    assert abs(d.min() - a / np.sqrt(2)) < 1e-8


def test_fcc_wall_rotation_limits():
    slab, nx = _create_fcc_wall(nx=10, nz=1, rotation=0.)
    assert slab.get_global_number_of_atoms() > 0

    with pytest.raises(RuntimeError):
        _create_fcc_wall(nx=10, nz=1, rotation=10.)
