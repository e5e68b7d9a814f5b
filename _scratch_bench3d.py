import time
import numpy as np, jax, jax.numpy as jnp
from justrelax_tpu.utils import bench_kernels as bk
from justrelax_tpu.ops.stokes3d_canvas import (
    ve3d_canvas_coefficients, stokes3d_chunk_canvas, pack_carry, unpack_carry)
from justrelax_tpu.ops.stencil import maxloc

n = 126
dtype = jnp.float32

# --- A: existing slice/pad XLA family -----------------------------------
stepA, carryA, constsA, bpi, ncells = bk.ve3d(n=n, dtype=dtype)
fA = jax.jit(stepA)

# --- B: canvas formulation, same physics config -------------------------
rng = np.random.default_rng(0)
eta = jnp.asarray(np.exp(0.3 * rng.normal(size=(n, n, n))), dtype)
fz = jnp.asarray(rng.normal(size=(n, n, n)), dtype)
Z3 = jnp.zeros((n, n, n), dtype)
eta_tau = maxloc(eta, window=1)
from justrelax_tpu.core.coeffs import PTStokesCoeffs
from justrelax_tpu.core.grid import Geometry
geometry = Geometry((n, n, n), (1.0, 1.0, 1.0))
inv_di = tuple(1.0 / d for d in geometry.di)
pt = PTStokesCoeffs.make(geometry.li, geometry.di)
co = ve3d_canvas_coefficients(eta, eta_tau, float(pt.r), float(pt.theta_dtau),
                              float(pt.etadtau), fx=Z3, fy=Z3, fz=fz)
co = jax.tree.map(lambda x: x.astype(dtype) if hasattr(x, "astype") else x, co)
fields = (jnp.zeros((n+1, n+2, n+2), dtype), jnp.zeros((n+2, n+1, n+2), dtype),
          jnp.zeros((n+2, n+2, n+1), dtype), Z3, Z3, Z3, Z3,
          jnp.zeros((n, n+1, n+1), dtype), jnp.zeros((n+1, n, n+1), dtype),
          jnp.zeros((n+1, n+1, n), dtype))
carryB = tuple(pack_carry(*fields))

def stepB(nit, carry, consts):
    return stokes3d_chunk_canvas(carry, consts, inv_di, nit)
fB = jax.jit(stepB)

def mat(o):
    return float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])

def t_once(f, nn, c, k):
    t0 = time.perf_counter(); mat(f(jnp.asarray(nn, jnp.int32), c, k)); return time.perf_counter() - t0

# numeric cross-check first: 5 iterations A vs B
outA = stepA(5, carryA, constsA)
outB = stepB(5, carryB, co)
gotB = unpack_carry(jnp.stack(outB), n, n, n)
(VA, PA, tauA) = outA
namesB = ("Vx","Vy","Vz","P","txx","tyy","tzz","tyz","txz","txy")
ref = (VA[0], VA[1], VA[2], PA) + tuple(tauA)
for name, a, b in zip(namesB, ref, gotB):
    a, b = np.asarray(a), np.asarray(b)
    print(f"check {name}: maxabs={np.max(np.abs(a-b)):.3e} scale={np.max(np.abs(a)):.3e}")

for name, f, c, k in (("A slice/pad", fA, carryA, constsA), ("B canvas", fB, carryB, co)):
    t_once(f, 5, c, k)
    t1 = min(t_once(f, 5, c, k) for _ in range(2))
    t2 = min(t_once(f, 405, c, k) for _ in range(2))
    t_iter = (t2 - t1) / 400
    teff = bpi / t_iter / 1e9
    print(f"{name}: t_iter={t_iter*1e6:.1f} us  T_eff(35N conv)={teff:.0f} GB/s  vs_peak={teff/819:.3f}")

# --- C: temporally-blocked Pallas kernel ---------------------------------
from justrelax_tpu.ops.pallas_stokes3d_blocked import (
    stokes3d_chunk_blocked, choose_blocking_3d)
print("blocking:", choose_blocking_3d(n, n, n, 11, 4))

def stepC(nit, carry, consts):
    return stokes3d_chunk_blocked(carry, consts, inv_di, nit)
fC = jax.jit(stepC)

outC = stepC(5, carryB, co)
gotC = [np.asarray(x) for x in outC]
gotB2 = [np.asarray(x) for x in stepB(5, carryB, co)]
for name, a, b in zip(namesB, gotB2, gotC):
    print(f"checkC {name}: maxabs={np.max(np.abs(a-b)):.3e} scale={np.max(np.abs(a)):.3e}")

t_once(fC, 5, carryB, co)
t1 = min(t_once(fC, 5, carryB, co) for _ in range(2))
t2 = min(t_once(fC, 405, carryB, co) for _ in range(2))
t_iter = (t2 - t1) / 400
teff = bpi / t_iter / 1e9
print(f"C blocked: t_iter={t_iter*1e6:.1f} us  T_eff(35N conv)={teff:.0f} GB/s  vs_peak={teff/819:.3f}")
