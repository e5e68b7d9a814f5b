"""Probe 3: two-point slope timing (RPC-latency-free) of roll costs."""
import time
from functools import partial
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def make(shape, rolls):
    def kern(a_ref, n_ref, o_ref):
        def body(_, a):
            s = a
            for sh, ax in rolls:
                s = s + jnp.roll(a, sh, ax)
            return 0.99 * a + 0.001 * s
        o_ref[:] = lax.fori_loop(0, n_ref[0], body, a_ref[:])
    return kern

def run(shape, rolls, name):
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape), jnp.float32)
    f = jax.jit(pl.pallas_call(
        make(shape, rolls),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    ))
    def t_once(n):
        nn = jnp.asarray([n], jnp.int32)
        t0 = time.perf_counter(); _ = float(np.asarray(f(x, nn)).ravel()[0]); return time.perf_counter()-t0
    try:
        t_once(100)
        t1 = min(t_once(100) for _ in range(3))
        t2 = min(t_once(20100) for _ in range(3))
        t = (t2 - t1) / 20000
        print(f"{name}: {t*1e6:8.3f} us/iter  {np.prod(shape)/t/1e9:7.2f} Gcell/s")
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:200]}")

run((384, 384), [], "384x384  none     ")
run((384, 384), [(-1,0),(1,0),(-1,1),(1,1),(-128,0),(128,0)], "384x384  mix6     ")
run((1152, 128), [(-1,0),(1,0),(-1,1),(1,1),(-128,0),(128,0)], "1152x128 mix6     ")
run((1152, 128), [(-1,1),(1,1),(-1,1),(1,1),(-1,1),(1,1)], "1152x128 lane6    ")
run((1152, 128), [(-1,0),(1,0),(-1,0),(1,0),(-1,0),(1,0)], "1152x128 sublane6 ")
run((1152, 128), [(-128,0),(128,0),(-128,0),(128,0),(-128,0),(128,0)], "1152x128 tile6    ")
