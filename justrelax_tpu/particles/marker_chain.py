"""Marker chain: Lagrangian surface/topography tracking.

Functional equivalent of JustPIC's ``MarkerChain`` + the reference's
``advect_markerchain!`` and ``update_phases_given_markerchain!``
(/root/reference/src/phases/topography_correction.jl): an ordered set of
markers describing a single-valued interface y = h(x), advected with the
staggered velocity field (RK2) and resampled back onto a uniform x lattice
each step (monotone-x invariant kept by construction).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from justrelax_tpu.particles.particles import _bilinear

Array = Any

__all__ = [
    "MarkerChain",
    "init_marker_chain",
    "advect_marker_chain",
    "phases_from_marker_chain",
    "update_phases_given_markerchain",
]


class MarkerChain(NamedTuple):
    x: Array  # marker x positions (n_markers,)
    y: Array  # marker heights


def init_marker_chain(geometry, height, n_per_cell: int = 4) -> MarkerChain:
    """Markers spanning the domain at ``n_per_cell`` per cell; ``height`` is a
    scalar or a callable h(x)."""
    nx = geometry.ni[0]
    ox = geometry.origin[0]
    lx = geometry.li[0]
    n = nx * n_per_cell + 1
    x = np.linspace(ox, ox + lx, n)
    h = np.full(n, float(height)) if np.isscalar(height) else np.asarray(height(x))
    return MarkerChain(x=jnp.asarray(x), y=jnp.asarray(h))


def _chain_velocity(chain: MarkerChain, V: Tuple[Array, Array], geometry):
    Vx, Vy = V
    dx, dy = geometry.di
    ox, oy = geometry.origin
    vx = _bilinear(Vx, ox, oy - dy / 2, dx, dy, chain.x, chain.y)
    vy = _bilinear(Vy, ox - dx / 2, oy, dx, dy, chain.x, chain.y)
    return vx, vy


def advect_marker_chain(
    chain: MarkerChain, V: Tuple[Array, Array], geometry, dt
) -> MarkerChain:
    """RK2 advection followed by resampling onto the original x lattice
    (linear interpolation of the displaced chain, clamped to the domain)."""
    vx1, vy1 = _chain_velocity(chain, V, geometry)
    xh = chain.x + 0.5 * dt * vx1
    yh = chain.y + 0.5 * dt * vy1
    vx2, vy2 = _chain_velocity(MarkerChain(x=xh, y=yh), V, geometry)
    x_new = chain.x + dt * vx2
    y_new = chain.y + dt * vy2

    # resample: h on the original lattice from the displaced markers
    order = jnp.argsort(x_new)
    xs, ys = x_new[order], y_new[order]
    h = jnp.interp(chain.x, xs, ys)
    oy, ly = geometry.origin[1], geometry.li[1]
    h = jnp.clip(h, oy, oy + ly)
    return MarkerChain(x=chain.x, y=h)


def update_phases_given_markerchain(
    chain: MarkerChain, particles, p_phase: Array, air_phase: int
):
    """Per-particle topography correction against the chain, run every step
    of the coupled loop (reference Caldera2D.jl:194,435 →
    src/phases/topography_correction.jl:36-90): a particle ABOVE the chain
    carrying a rock phase, or an AIR particle BELOW the chain, is
    inconsistent with the tracked surface. The reference deactivates such
    particles (NaNs coords + clears the index; its per-particle
    phase-reassignment lines are commented out) and lets the injection pass
    re-seed the emptied slots with the corrected phase — this does the
    same: returns ``particles`` with offenders deactivated, so the coupled
    loop's ``inject_particles(..., phases=corrected_field)`` refill gives
    them the phase the chain implies.

    ``p_phase`` is the per-particle phase carrier (float, rounded ints).
    Returns ``(particles, n_corrected)``.
    """
    h = jnp.interp(particles.px, chain.x, chain.y)
    above = particles.py > h
    is_air = jnp.round(p_phase) == air_phase
    bad = particles.active & ((above & ~is_air) | (~above & is_air))
    return particles.replace(active=particles.active & ~bad), jnp.sum(bad)


def phases_from_marker_chain(
    chain: MarkerChain, geometry, phase_below: int, phase_above: int
) -> Array:
    """Cell-centered integer phase field: ``phase_above`` (e.g. air) above the
    chain, ``phase_below`` below (reference
    update_phases_given_markerchain!)."""
    X, Y = geometry.cell_centers_mesh()
    hX = jnp.interp(jnp.asarray(X[:, 0]), chain.x, chain.y)
    above = jnp.asarray(Y) > hX[:, None]
    return jnp.where(above, phase_above, phase_below)
