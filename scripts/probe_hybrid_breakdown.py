"""On-chip breakdown of the r05 hybrid 3D VEP iteration (126^3 f32).

Measures three loops with the bench's two-point-slope method:
  A. full hybrid iteration (pallas_vep3d_edges family step)
  B. the Pallas edges kernel ALONE (tau_e/lam_e fed back, rest frozen)
  C. the XLA remainder alone (edges replaced by passthrough)

Run on the axon TPU:  python scripts/probe_hybrid_breakdown.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from justrelax_tpu.utils import bench_kernels as bk  # noqa: E402


def materialize(out):
    leaf = jax.tree.leaves(out)[0]
    return float(np.asarray(jnp.sum(leaf)))


def time_loop(fn, carry, consts, n_lo=2, n_hi=None, target_s=0.6):
    fn = jax.jit(fn)
    c = jax.jit(lambda n, c, k: fn(n, c, k)).lower(
        jnp.asarray(10, jnp.int32), carry, consts).compile()
    materialize(c(jnp.asarray(10, jnp.int32), carry, consts))  # warmup

    def once(n):
        t0 = time.perf_counter()
        materialize(c(jnp.asarray(n, jnp.int32), carry, consts))
        return time.perf_counter() - t0

    t10 = once(10)
    t_est = max((t10 - once(2)) / 8, 1e-7)
    dn = max(int(target_s / t_est), 8)
    n_hi = n_lo + dn
    reps = []
    for _ in range(3):
        reps.append((once(n_hi) - once(n_lo)) / dn)
    return min(reps), sorted(reps)[1], reps


def main():
    phases = set(sys.argv[1]) if len(sys.argv) > 1 else {"A", "B", "C"}
    n = 126
    print("building family on CPU...", file=sys.stderr)
    step, carry, co, bpi, n_cells = bk.build_family_on_cpu(
        "pallas_vep3d_edges")
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    from justrelax_tpu.core.grid import Geometry
    geometry = Geometry((n, n, n), (1.0, 1.0, 1.0))
    inv_di = tuple(1.0 / d for d in geometry.di)
    dt = jnp.asarray(0.125, jnp.float32)

    # A: full hybrid
    if "A" in phases:
        best, med, reps = time_loop(step, carry, co)
        print(f"A full hybrid: {best*1e6:.1f} us/iter (median {med*1e6:.1f}) "
              f"reps={[round(r*1e6,1) for r in reps]}", flush=True)

    # B: edges kernel alone, feeding tau_e/lam_e back
    from justrelax_tpu.ops.pallas_vep3d_edges import vep3d_edges_blocked

    def step_edges(n_iter, c2, co2):
        V, theta, eta, tau_c = c2["V"], c2["theta"], c2["eta"], c2["tau_c"]

        def body(_, t):
            tau_e, lam_e = t
            return vep3d_edges_blocked(
                V, theta, eta, tau_c, tau_e, lam_e, co2, inv_di,
                dt=dt, theta_dtau=jnp.asarray(0.12, jnp.float32),
                lambda_relaxation=0.2, nvals=40,
            )
        return jax.lax.fori_loop(0, n_iter, body,
                                 (c2["tau_e"], c2["lam_e"]))

    c2 = {"V": carry.V, "theta": carry.theta, "eta": carry.eta,
          "tau_c": carry.tau_c, "tau_e": carry.tau_e, "lam_e": carry.lam_e}
    if "B" in phases:
        best, med, reps = time_loop(step_edges, c2, co)
        print(f"B edges kernel alone: {best*1e6:.1f} us/iter "
              f"(median {med*1e6:.1f}) reps={[round(r*1e6,1) for r in reps]}",
              flush=True)

    # C: XLA remainder (edges passthrough)
    import justrelax_tpu.ops.stokes3d_vep_canvas as cv
    from justrelax_tpu.ops import pallas_vep3d_edges as pe

    real = pe.vep3d_edges_blocked

    def fake_edges(V, theta, eta, tau_c6, tau_e3, lam_e3, co3, inv_di3,
                   **kw):
        return tau_e3, lam_e3

    pe.vep3d_edges_blocked = fake_edges
    try:
        import importlib
        # iteration imports the symbol lazily inside the function, so the
        # monkeypatch takes effect without reload
        from justrelax_tpu.ops.stokes3d_vep_canvas import vep3d_chunk_canvas
        from justrelax_tpu.rheology.materials import Material, MaterialStack
        import math
        C = 1.6 / math.cos(math.radians(30.0))
        common = dict(rho0=0.0, Kb=4.0, is_plastic=1.0, C=C,
                      friction_angle=30.0, dilation_angle=0.0,
                      eta_reg=1.25e-2)
        material = MaterialStack.make([
            Material(G=1.0, eta0=1.0, **common),
            Material(G=0.5, eta0=0.1, **common),
        ])
        kw = dict(dt=dt, r=jnp.asarray(0.7, jnp.float32),
                  theta_dtau=jnp.asarray(0.12, jnp.float32),
                  etadtau=jnp.asarray(0.1, jnp.float32),
                  lambda_relaxation=0.2, viscosity_relaxation=1.0e-2)

        def step_c(n_iter, carry3, co3):
            return vep3d_chunk_canvas(
                carry3, co3, material, inv_di, n_iter,
                edges_pallas=True, **kw)

        if "C" in phases:
            best, med, reps = time_loop(step_c, carry, co)
            print(f"C XLA remainder: {best*1e6:.1f} us/iter "
                  f"(median {med*1e6:.1f}) "
                  f"reps={[round(r*1e6,1) for r in reps]}", flush=True)
    finally:
        pe.vep3d_edges_blocked = real


if __name__ == "__main__":
    main()
