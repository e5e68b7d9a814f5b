import time
import numpy as np, jax, jax.numpy as jnp
from justrelax_tpu.ops.stokes3d_canvas import (
    ve3d_canvas_coefficients, pack_carry)
from justrelax_tpu.ops.pallas_stokes3d_blocked import (
    stokes3d_chunk_blocked, choose_blocking_3d)
from justrelax_tpu.ops.stencil import maxloc
from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import Geometry

n = 126
dtype = jnp.float32
rng = np.random.default_rng(0)
eta = jnp.asarray(np.exp(0.3 * rng.normal(size=(n, n, n))), dtype)
fz = jnp.asarray(rng.normal(size=(n, n, n)), dtype)
Z3 = jnp.zeros((n, n, n), dtype)
geometry = Geometry((n, n, n), (1.0, 1.0, 1.0))
inv_di = tuple(1.0 / d for d in geometry.di)
pt = PTStokesCoeffs.make(geometry.li, geometry.di)
eta_tau = maxloc(eta, 1)
co = ve3d_canvas_coefficients(eta, eta_tau, float(pt.r), float(pt.theta_dtau),
                              float(pt.etadtau), fx=Z3, fy=Z3, fz=fz)
co = jax.tree.map(lambda x: x.astype(dtype) if hasattr(x, "astype") else x, co)
fields = (jnp.zeros((n+1, n+2, n+2), dtype), jnp.zeros((n+2, n+1, n+2), dtype),
          jnp.zeros((n+2, n+2, n+1), dtype), Z3, Z3, Z3, Z3,
          jnp.zeros((n, n+1, n+1), dtype), jnp.zeros((n+1, n, n+1), dtype),
          jnp.zeros((n+1, n+1, n), dtype))
carry = tuple(pack_carry(*fields))
vk = dict(viscous_consts=(eta, eta_tau, Z3, Z3, fz),
          pt_scalars=(float(pt.r)/float(pt.theta_dtau), float(pt.theta_dtau), float(pt.etadtau)))

def mat(o):
    return float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])

def bench(label, co_arg, extra, n_const, n_derived):
    cfg = choose_blocking_3d(n, n, n, n_const, 4,
                             plane_block=extra.get("plane_block"),
                             iters_per_pass=extra.get("iters_per_pass"),
                             n_derived=n_derived)
    f = jax.jit(lambda nit, c: stokes3d_chunk_blocked(c, co_arg, inv_di, nit, **extra))
    def t_once(nn):
        t0 = time.perf_counter(); mat(f(jnp.asarray(nn, jnp.int32), carry)); return time.perf_counter()-t0
    try:
        t_once(4)
        t1 = min(t_once(4) for _ in range(2))
        t2 = min(t_once(204) for _ in range(2))
        t = (t2 - t1) / 200
        print(f"{label} cfg={cfg}: {t*1e6:.1f} us/iter vs_peak={35*n**3*4/t/1e9/819:.3f}")
    except Exception as e:
        print(f"{label} cfg={cfg}: FAILED {str(e)[:300]}")

bench("stream, budget84  ", co, {}, 11, 0)
bench("stream, nopipe    ", co, dict(pipeline=False), 11, 0)
bench("derive_viscous    ", None, dict(**vk), 5, 11)
bench("derive k=3        ", None, dict(iters_per_pass=3, **vk), 5, 11)
