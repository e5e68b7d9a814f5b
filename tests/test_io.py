"""Checkpoint/restart round-trips + VTK output (reference test_IO.jl)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from justrelax_tpu.core.grid import Geometry
from justrelax_tpu.core.state import StokesState, ThermalState
from justrelax_tpu.io.checkpoint import (
    checkpointing,
    checkpointing_hdf5,
    load_checkpoint,
    load_checkpoint_hdf5,
)
from justrelax_tpu.io.vtk import VTKSeries, save_vti


def _dummy_states(ni=(6, 5)):
    rng = np.random.default_rng(0)
    stokes = StokesState.make(ni)
    stokes = stokes.replace(
        P=jnp.asarray(rng.standard_normal(ni)),
        V=stokes.V.replace(Vx=jnp.asarray(rng.standard_normal((ni[0] + 1, ni[1] + 2)))),
    )
    thermal = ThermalState.make(ni)
    thermal = thermal.replace(T=jnp.asarray(rng.standard_normal((ni[0] + 2, ni[1] + 2))))
    return stokes, thermal


def test_npz_checkpoint_roundtrip(tmp_path):
    stokes, thermal = _dummy_states()
    path = checkpointing(str(tmp_path), stokes, thermal, time=1.5, timestep=3.0)
    assert os.path.exists(path)
    s2, t2, time, step = load_checkpoint(
        path, StokesState.make((6, 5)), ThermalState.make((6, 5))
    )
    np.testing.assert_array_equal(np.asarray(s2.P), np.asarray(stokes.P))
    np.testing.assert_array_equal(np.asarray(s2.V.Vx), np.asarray(stokes.V.Vx))
    np.testing.assert_array_equal(np.asarray(t2.T), np.asarray(thermal.T))
    assert time == 1.5 and step == 3.0


def test_npz_checkpoint_per_rank(tmp_path):
    stokes, thermal = _dummy_states()
    p = checkpointing(str(tmp_path), stokes, thermal, 0.0, 1.0, rank=3)
    assert p.endswith("checkpoint3.npz")


def test_hdf5_checkpoint_roundtrip(tmp_path):
    stokes, thermal = _dummy_states()
    path = checkpointing_hdf5(str(tmp_path), stokes, thermal, time=2.0, timestep=4.0)
    fields, time, step = load_checkpoint_hdf5(path)
    np.testing.assert_allclose(fields["P"], np.asarray(stokes.P, dtype=np.float32))
    assert "T" in fields and time == 2.0 and step == 4.0


def test_vti_and_series(tmp_path):
    g = Geometry((8, 6), (2.0, 1.5), origin=(0.0, -1.5))
    cell = {"P": np.random.default_rng(1).standard_normal((8, 6))}
    point = {"T": np.zeros((9, 7))}
    p = save_vti(str(tmp_path / "out"), g, cell_data=cell, point_data=point)
    text = open(p).read()
    assert "ImageData" in text and 'Name="P"' in text and 'Name="T"' in text

    series = VTKSeries(str(tmp_path / "series"))
    series.append(g, 0.0, cell_data=cell)
    series.append(g, 1.0, cell_data=cell)
    pvd = open(series.path).read()
    assert pvd.count("DataSet") == 2


def test_save_particles_roundtrip(tmp_path):
    """save_particles writes only active slots, with phase + extra fields
    decodable from the .vtp (reference save_particles2D, VTK.jl:367-392)."""
    import base64
    import struct
    import xml.etree.ElementTree as ET

    import jax.numpy as jnp

    from justrelax_tpu.io.vtk import save_particles

    class P:
        px = jnp.asarray([[[0.1, 0.2], [0.3, 0.4]]])  # (1, 2, 2) slots
        py = jnp.asarray([[[1.1, 1.2], [1.3, 1.4]]])
        active = jnp.asarray([[[True, False], [True, True]]])

    phases = jnp.asarray([[[1.0, 9.0], [2.0, 3.0]]])
    path = save_particles(str(tmp_path / "parts"), P, phases=phases,
                          fields={"T": phases * 10})
    root = ET.parse(path).getroot()

    def decode(name, dtype):
        for da in root.iter("DataArray"):
            if da.get("Name") == name:
                raw = base64.b64decode(da.text.strip())
                (nbytes,) = struct.unpack("<Q", raw[:8])
                return np.frombuffer(raw[8:8 + nbytes], dtype=dtype)
        raise KeyError(name)

    pts = decode("Points", np.float32).reshape(-1, 3)
    assert pts.shape == (3, 3)  # 3 active of 4 slots
    np.testing.assert_allclose(pts[:, 0], [0.1, 0.3, 0.4], rtol=1e-6)
    np.testing.assert_allclose(pts[:, 1], [1.1, 1.3, 1.4], rtol=1e-6)
    np.testing.assert_allclose(decode("phase", np.float32), [1.0, 2.0, 3.0])
    np.testing.assert_allclose(decode("T", np.float32), [10.0, 20.0, 30.0])
    conn = decode("connectivity", np.int64)
    np.testing.assert_array_equal(conn, [0, 1, 2])


def test_save_marker_chain(tmp_path):
    import base64
    import struct
    import xml.etree.ElementTree as ET

    from justrelax_tpu.core.grid import Geometry
    from justrelax_tpu.io.vtk import save_marker_chain
    from justrelax_tpu.particles.marker_chain import init_marker_chain

    g = Geometry((8, 8), (1.0, 1.0))
    chain = init_marker_chain(g, height=0.75, n_per_cell=2)
    path = save_marker_chain(str(tmp_path / "chain"), chain)
    root = ET.parse(path).getroot()
    piece = next(root.iter("Piece"))
    n = int(piece.get("NumberOfPoints"))
    assert n == 17 and piece.get("NumberOfLines") == "1"
    for da in root.iter("DataArray"):
        if da.get("Name") == "Points":
            raw = base64.b64decode(da.text.strip())
            (nbytes,) = struct.unpack("<Q", raw[:8])
            pts = np.frombuffer(raw[8:8 + nbytes], dtype=np.float32).reshape(-1, 3)
    np.testing.assert_allclose(pts[:, 1], 0.75)
    np.testing.assert_allclose(pts[0, 0], 0.0)
    np.testing.assert_allclose(pts[-1, 0], 1.0)
