"""Benchmark: effective memory throughput of the APT Stokes PT iteration.

The APT method is memory-bandwidth bound (Räss et al. 2022 GMD; reference
docs/src/man/equations_APT.md:38): the per-chip figure of merit is T_eff —
the necessary memory traffic of one fused PT iteration divided by its wall
time — against the HBM speed-of-light, plus grid-updates/s.

Traffic accounting (Räss convention, f32):
  unknowns (read+write): Vx, Vy, P, τxx, τyy, τxy            → 12·N
  fields   (read only) : η, ητ, G, K, P0, Q, ρgx, ρgy, τ_o×3 → 11·N
  A_eff = 23·N·4 bytes per iteration.

Prints ONE JSON line; vs_baseline = T_eff / HBM peak (v5e: 819 GB/s).
Runs on the real TPU through the default environment (JAX_PLATFORMS=axon).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# NOTE: bench wall time is dominated by ONE ~5 min axon remote compile of the
# chunk kernel (measured: calls are 0.14-0.43 s; the persistent compilation
# cache does not capture axon-compiled executables, so it cannot help).


def _materialize(out):
    """Force execution by pulling the first output array to the host (the
    axon relay's block_until_ready can return before execution completes).
    The transfer cost is a fixed per-call overhead, cancelled by the
    two-point slope below."""
    import numpy as np

    return float(np.asarray(out[0]).ravel()[0])


def _time_once(jitted, args):
    t0 = time.perf_counter()
    _materialize(jitted(*args))
    return time.perf_counter() - t0


def _slope(jit1, jit2, args, repeats):
    """Min-of-repeats times for the two chunk sizes, sampled interleaved so
    tunnel/host contention hits both alike; returns (min t1, min t2)."""
    for j in (jit1, jit2):  # compile + warmup
        _materialize(j(*args))
    t1s, t2s = [], []
    for _ in range(repeats):
        t1s.append(_time_once(jit1, args))
        t2s.append(_time_once(jit2, args))
    return min(t1s), min(t2s)


def main(nx=1024, ny=1024, nout_pair=(200, 2200), repeats=4):
    """``nout_pair`` is chosen so the slope signal (Δnout·t_iter ≈ 0.3 s)
    dominates the axon tunnel's per-call jitter (~10-100 ms on a ~6 s
    call)."""
    import __graft_entry__ as g

    dtype = jnp.float32
    geometry, stokes, pt, bc, rho_g, G, K = g._solcx_setup(nx, ny, dtype)
    args = (
        stokes.V.Vx,
        stokes.V.Vy,
        stokes.P,
        stokes.tau.xx,
        stokes.tau.yy,
        stokes.tau.xy,
        stokes.P0,
        stokes.Q,
        stokes.viscosity.eta,
        G,
        K,
        rho_g[0],
        rho_g[1],
        jnp.asarray(0.1, dtype),
    )
    # two-point slope cancels the fixed dispatch/transfer overhead per call;
    # nout is a TRACED fori_loop bound so both points share one compile
    n1, n2 = nout_pair
    step = g._step_fn(geometry, pt, bc, nout=None)

    @jax.jit
    def chunk(n, *a):
        return step(*a, nout=n)

    t1, t2 = _slope(
        lambda *a: chunk(jnp.asarray(n1, jnp.int32), *a),
        lambda *a: chunk(jnp.asarray(n2, jnp.int32), *a),
        args,
        repeats,
    )

    n_cells = nx * ny
    t_iter = max((t2 - t1) / (n2 - n1), 1e-12)
    gups = n_cells / t_iter / 1e9  # giga grid-updates/s
    a_eff = 23 * n_cells * 4  # bytes per iteration
    t_eff = a_eff / t_iter / 1e9  # GB/s
    hbm_peak = 819.0  # v5e HBM GB/s
    print(
        json.dumps(
            {
                "metric": "stokes2d_pt_iteration_T_eff",
                "value": round(t_eff, 2),
                "unit": "GB/s",
                "vs_baseline": round(t_eff / hbm_peak, 4),
            }
        )
    )
    return t_eff, gups


if __name__ == "__main__":
    main()
