"""Time-step control (reference src/Utils.jl:492-519)."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp

Array = Any

__all__ = ["compute_dt"]


def compute_dt(V: Tuple[Array, ...], di: Tuple[float, ...], dt_diff: float = jnp.inf):
    """Advective CFL limit min_d(di_d / max|V_d|)·0.9, capped by the
    diffusive limit ``dt_diff``."""
    dt_adv = jnp.inf
    for v, d in zip(V, di):
        dt_adv = jnp.minimum(dt_adv, d / jnp.max(jnp.abs(v)))
    return jnp.minimum(dt_diff, dt_adv * 0.9)
