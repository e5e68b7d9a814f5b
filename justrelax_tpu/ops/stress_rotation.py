"""Elastic stress rotation (advection coupling).

Reference: src/stress_rotation/stress_rotation_{grid,particles}.jl. The old
deviatoric stress τ_o must co-rotate with the material between timesteps.
Two routes, as in the reference:

- grid-based Jaumann update at cell centers:
    τ ← τ + dt·(τ·ω − ω·τ)  with ω the xy vorticity at the center
  (the reference's in-place kernel stores only the rotation increment and
  zeroes its advection term — stress_rotation_grid.jl:66-71 — we implement
  the consistent co-rotation update);
- per-particle finite rotation (Euler–Rodrigues in 3D; 2D closed form):
    τ* = R τ Rᵀ with rotation angle θ = ω·dt.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from justrelax_tpu.ops.stencil import av_a

Array = Any

__all__ = ["rotate_stress_grid_2d", "rotate_stress_particles_2d", "compute_vorticity_center"]


def compute_vorticity_center(Vx, Vy, inv_dx, inv_dy):
    """ω_xy = ½(∂Vy/∂x − ∂Vx/∂y) averaged to cell centers."""
    w_v = 0.5 * (
        (Vy[1:, :] - Vy[:-1, :]) * inv_dx - (Vx[:, 1:] - Vx[:, :-1]) * inv_dy
    )
    return av_a(w_v)


def rotate_stress_grid_2d(txx, tyy, txy_c, omega_c, dt):
    """Jaumann co-rotation of the center stress tensor by ω·dt."""
    # dτ/dt = τ·W − W·τ with W = [[0, −ω], [ω, 0]]
    dxx = -2.0 * omega_c * txy_c
    dyy = 2.0 * omega_c * txy_c
    dxy = omega_c * (txx - tyy)
    return txx + dt * dxx, tyy + dt * dyy, txy_c + dt * dxy


def rotate_stress_particles_2d(p_txx, p_tyy, p_txy, omega_p, dt):
    """Finite rotation of per-particle stress by θ = ω·dt (reference
    rotate_stress_particles! finite-rotation-matrix variant)."""
    theta = omega_p * dt
    c, s = jnp.cos(theta), jnp.sin(theta)
    # R τ Rᵀ for R = [[c, −s], [s, c]]
    xx = c * c * p_txx - 2 * c * s * p_txy + s * s * p_tyy
    yy = s * s * p_txx + 2 * c * s * p_txy + c * c * p_tyy
    xy = c * s * (p_txx - p_tyy) + (c * c - s * s) * p_txy
    return xx, yy, xy
