import math, time
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from justrelax_tpu.utils.bench_kernels import _solcx_setup
from justrelax_tpu.ops.pallas_stokes import stokes_chunk_blocked, choose_blocking
from justrelax_tpu.ops import stokes as kernels
from justrelax_tpu.ops.bc import flow_bcs
from justrelax_tpu.ops.stencil import maxloc

n = 1024
dtype = jnp.float32
geometry, stokes, pt, bc, rho_g, G, K = _solcx_setup(n, n, dtype)
inv_dx, inv_dy = 1.0 / geometry.di[0], 1.0 / geometry.di[1]
r, theta, etadtau = float(pt.r), float(pt.theta_dtau), float(pt.etadtau)
eta = stokes.viscosity.eta
eta_tau = maxloc(eta, window=1)
print("blocking:", choose_blocking(n, n, 4))

Z = jnp.zeros((n, n), dtype)
carry = (jnp.zeros((n+1, n+2), dtype), jnp.zeros((n+2, n+1), dtype),
         Z, Z, Z, jnp.zeros((n+1, n+1), dtype))

def blocked_step(nout, carry):
    return stokes_chunk_blocked(*carry, eta, eta_tau, rho_g[0], rho_g[1],
                                inv_dx, inv_dy, r, theta, etadtau, nout=nout)

# XLA reference step (ve2d family one_iteration, viscous limit)
P0, Q = stokes.P0, stokes.Q
dt = jnp.asarray(0.1, dtype)
def xla_step(nout, carry):
    zeros = jnp.zeros_like(P0); zeros_v = jnp.zeros((n+1, n+1), dtype)
    def body(_, c):
        Vx, Vy, P, txx, tyy, txy = c
        grad_V = kernels.compute_grad_V(Vx, Vy, inv_dx, inv_dy)
        RP, P = kernels.compute_P(P, P0, grad_V, Q, eta_tau, K, G, dt, r, theta)
        exx, eyy, exy = kernels.compute_strain_rate(grad_V, Vx, Vy, inv_dx, inv_dy)
        txx, tyy, txy = kernels.compute_tau_ve(txx, tyy, txy, zeros, zeros, zeros_v,
                                               exx, eyy, exy, eta, G, theta, dt)
        Vx, Vy = kernels.compute_V(Vx, Vy, P, txx, tyy, txy, etadtau,
                                   rho_g[0], rho_g[1], eta_tau, inv_dx, inv_dy)
        Vx, Vy = flow_bcs((Vx, Vy), bc)
        return (Vx, Vy, P, txx, tyy, txy)
    return lax.fori_loop(0, nout, body, carry)

fb = jax.jit(blocked_step)
fx = jax.jit(xla_step)

def mat(o):
    return float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])

def t_once(f, nn, c):
    t0 = time.perf_counter(); mat(f(jnp.asarray(nn, jnp.int32), c)); return time.perf_counter() - t0

# numeric check: 48 iters both paths
ob = blocked_step(48, carry)
ox = xla_step(48, carry)
for name, a, b in zip(("Vx","Vy","P","txx","tyy","txy"), ob, ox):
    a, b = np.asarray(a), np.asarray(b)
    scale = max(1e-30, float(np.max(np.abs(b))))
    print(f"check {name}: maxabs={np.max(np.abs(a-b)):.3e} scale={scale:.3e}")

for name, f in (("blocked", fb), ("xla", fx)):
    t_once(f, 8, carry)
    t1 = min(t_once(f, 8, carry) for _ in range(2))
    t2 = min(t_once(f, 808, carry) for _ in range(2))
    t_iter = (t2 - t1) / 800
    teff = 16 * n * n * 4 / t_iter / 1e9
    print(f"{name}: t_iter={t_iter*1e6:.2f} us  T_eff(16N)={teff:.0f} GB/s  GUPS={n*n/t_iter/1e9:.2f}")
