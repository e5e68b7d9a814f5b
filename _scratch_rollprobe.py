"""Probe: cost of 3D rolls vs flat-2D rolls in a Pallas VMEM loop on v5e."""
import time
from functools import partial
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

X, Y, Z = 16, 128, 128
N_IT = 200

def kern3d(a_ref, o_ref, *, nit):
    def body(_, a):
        # 6 rolls (one per direction/axis) + arithmetic, mimicking stencil mix
        s = (jnp.roll(a, -1, 0) + jnp.roll(a, 1, 0)
             + jnp.roll(a, -1, 1) + jnp.roll(a, 1, 1)
             + jnp.roll(a, -1, 2) + jnp.roll(a, 1, 2))
        return 0.99 * a + 0.001 * s
    o_ref[:] = lax.fori_loop(0, nit, body, a_ref[:])

def kernflat(a_ref, o_ref, *, nit):
    def body(_, a):
        s = (jnp.roll(a, -Y, 0) + jnp.roll(a, Y, 0)
             + jnp.roll(a, -1, 0) + jnp.roll(a, 1, 0)
             + jnp.roll(a, -1, 1) + jnp.roll(a, 1, 1))
        return 0.99 * a + 0.001 * s
    o_ref[:] = lax.fori_loop(0, nit, body, a_ref[:])

def kernflat_reshaped(a_ref, o_ref, *, nit):
    # input is 3D; flatten inside the kernel (layout-compat reshape), roll in 2D
    def body(_, a):
        f = a.reshape(X * Y, Z)
        s = (jnp.roll(f, -Y, 0) + jnp.roll(f, Y, 0)
             + jnp.roll(f, -1, 0) + jnp.roll(f, 1, 0)
             + jnp.roll(f, -1, 1) + jnp.roll(f, 1, 1))
        return (0.99 * f + 0.001 * s).reshape(X, Y, Z)
    o_ref[:] = lax.fori_loop(0, nit, body, a_ref[:])

def run(kern, shape, name):
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape), jnp.float32)
    f = jax.jit(pl.pallas_call(
        partial(kern, nit=N_IT),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    ))
    try:
        r = f(x); _ = float(np.asarray(r).ravel()[0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); _ = float(np.asarray(f(x)).ravel()[0]); ts.append(time.perf_counter()-t0)
        t = min(ts)
        print(f"{name}: {t/N_IT*1e6:.2f} us/iter for {np.prod(shape)/1e3:.0f}K cells -> {np.prod(shape)*N_IT/t/1e9:.1f} Gcell/s")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")

run(kern3d, (X, Y, Z), "3D rolls      ")
run(kernflat, (X * Y, Z), "flat 2D rolls ")
run(kernflat_reshaped, (X, Y, Z), "3D via reshape")
