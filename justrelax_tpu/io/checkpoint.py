"""Checkpoint / restart.

Two formats mirroring the reference (SURVEY.md §5):

- :func:`checkpointing` / :func:`load_checkpoint` — whole-state checkpoint of
  the Stokes+Thermal pytrees plus (time, timestep), written atomically
  (write-to-tmp-then-rename), the analogue of the reference JLD2 path
  (/root/reference/src/IO/JLD2.jl:40-143). Storage is a flat ``.npz``.
- :func:`checkpointing_hdf5` / :func:`load_checkpoint_hdf5` — field-wise
  float32 checkpoint of the primary fields (τ, V, P, T), the analogue of
  /root/reference/src/IO/H5.jl:33-106.

Distributed runs pass a ``rank`` to get per-device files
(``checkpoint<rank>.npz``), like the reference's per-rank JLD2 files.
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from justrelax_tpu.core.state import StokesState, ThermalState

__all__ = [
    "checkpointing",
    "load_checkpoint",
    "checkpointing_particles",
    "load_checkpoint_particles",
    "checkpointing_hdf5",
    "load_checkpoint_hdf5",
]


def _flatten_state(prefix: str, state) -> dict:
    flat = {}
    leaves, treedef = jax.tree_util.tree_flatten_with_path(state)
    for path, leaf in leaves:
        key = prefix + "/".join(str(getattr(p, "name", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _atomic_savez(dst: str, payload: dict) -> None:
    d = os.path.dirname(os.path.abspath(dst)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
    os.close(fd)
    try:
        np.savez(tmp, **payload)
        os.replace(tmp, dst)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def checkpointing(
    dst: str,
    stokes: StokesState,
    thermal: Optional[ThermalState],
    time: float,
    timestep: float,
    rank: Optional[int] = None,
) -> str:
    """Atomic whole-state checkpoint → ``<dst>/checkpoint[rank].npz``."""
    name = f"checkpoint{rank if rank is not None else ''}.npz"
    path = os.path.join(dst, name)
    payload = {"time": np.asarray(time), "timestep": np.asarray(timestep)}
    payload.update(_flatten_state("stokes/", stokes))
    if thermal is not None:
        payload.update(_flatten_state("thermal/", thermal))
    _atomic_savez(path, payload)
    return path


def _unflatten_into(prefix: str, template, data: dict):
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path, leaf in leaves:
        key = prefix + "/".join(str(getattr(p, "name", getattr(p, "idx", p))) for p in path)
        new_leaves.append(jnp.asarray(data[key]) if key in data else leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_checkpoint(
    path: str,
    stokes_template: StokesState,
    thermal_template: Optional[ThermalState] = None,
) -> Tuple[StokesState, Optional[ThermalState], float, float]:
    """Restore (stokes, thermal, time, timestep) from a checkpoint file.

    Templates supply the pytree structure (make fresh states of the right
    grid size, as the reference's ``load_checkpoint_jld2`` relies on stored
    struct layout)."""
    with np.load(path) as data:
        d = dict(data)
    stokes = _unflatten_into("stokes/", stokes_template, d)
    thermal = (
        _unflatten_into("thermal/", thermal_template, d)
        if thermal_template is not None
        else None
    )
    return stokes, thermal, float(d["time"]), float(d["timestep"])


def checkpointing_particles(
    dst: str,
    particles,
    fields: Optional[dict] = None,
    t: float = 0.0,
    dt: float = 0.0,
    it: int = 0,
    rank: Optional[int] = None,
) -> str:
    """Atomic particle checkpoint → ``<dst>/particles[rank].npz``
    (the analogue of the reference's ``checkpointing_particles``, call site
    miniapps/subduction/2D/Subduction2D.jl:271): positions + activity mask
    + every per-particle field (phase, T, stresses, ...) + (t, dt, it)."""
    name = f"particles{rank if rank is not None else ''}.npz"
    path = os.path.join(dst, name)
    payload = {
        "t": np.asarray(t), "dt": np.asarray(dt), "it": np.asarray(it),
        "px": np.asarray(particles.px), "py": np.asarray(particles.py),
        "active": np.asarray(particles.active),
        "min_xcell": np.asarray(particles.min_xcell),
        "nxcell": np.asarray(particles.nxcell),
    }
    for k, v in (fields or {}).items():
        payload[f"field/{k}"] = np.asarray(v)
    _atomic_savez(path, payload)
    return path


def load_checkpoint_particles(path: str):
    """Restore ``(particles, fields, t, dt, it)`` saved by
    :func:`checkpointing_particles` (reference Subduction2D_restart.jl:81)."""
    from justrelax_tpu.particles.particles import Particles

    with np.load(path) as data:
        d = dict(data)
    particles = Particles(
        px=jnp.asarray(d["px"]), py=jnp.asarray(d["py"]),
        active=jnp.asarray(d["active"]),
        min_xcell=int(d["min_xcell"]), nxcell=int(d["nxcell"]),
    )
    fields = {
        k[len("field/"):]: jnp.asarray(v)
        for k, v in d.items() if k.startswith("field/")
    }
    return particles, fields, float(d["t"]), float(d["dt"]), int(d["it"])


def checkpointing_hdf5(
    dst: str,
    stokes: StokesState,
    thermal: Optional[ThermalState],
    time: float,
    timestep: float,
) -> str:
    """Field-wise float32 HDF5 checkpoint (reference H5.jl:33-76)."""
    import h5py

    os.makedirs(dst, exist_ok=True)
    path = os.path.join(dst, "checkpoint.h5")
    fields = {
        "P": stokes.P,
        "Vx": stokes.V.Vx,
        "Vy": stokes.V.Vy,
        "txx": stokes.tau.xx,
        "tyy": stokes.tau.yy,
        "txy": stokes.tau.xy,
    }
    if stokes.V.Vz is not None:
        fields.update(Vz=stokes.V.Vz, tzz=stokes.tau.zz, tyz=stokes.tau.yz, txz=stokes.tau.xz)
    if thermal is not None:
        fields["T"] = thermal.T
    tmp = path + ".tmp"
    with h5py.File(tmp, "w") as f:
        f.attrs["time"] = float(time)
        f.attrs["timestep"] = float(timestep)
        for k, v in fields.items():
            f.create_dataset(k, data=np.asarray(v, dtype=np.float32))
    os.replace(tmp, path)
    return path


def load_checkpoint_hdf5(path: str) -> Tuple[dict, float, float]:
    import h5py

    out = {}
    with h5py.File(path, "r") as f:
        for k in f.keys():
            out[k] = np.asarray(f[k])
        time = float(f.attrs["time"])
        timestep = float(f.attrs["timestep"])
    return out, time, timestep
