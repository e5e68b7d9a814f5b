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
