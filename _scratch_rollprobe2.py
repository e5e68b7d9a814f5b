"""Probe 2: which (shape, roll-axis) combinations are fast on v5e?"""
import time
from functools import partial
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_IT = 200

def make(shape, rolls):
    def kern(a_ref, o_ref):
        def body(_, a):
            s = a
            for sh, ax in rolls:
                s = s + jnp.roll(a, sh, ax)
            return 0.99 * a + 0.001 * s
        o_ref[:] = lax.fori_loop(0, N_IT, body, a_ref[:])
    return kern

def run(shape, rolls, name):
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape), jnp.float32)
    f = jax.jit(pl.pallas_call(
        make(shape, rolls),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    ))
    try:
        _ = float(np.asarray(f(x)).ravel()[0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); _ = float(np.asarray(f(x)).ravel()[0]); ts.append(time.perf_counter()-t0)
        t = min(ts) / N_IT
        print(f"{name}: {t*1e6:8.2f} us/iter  {np.prod(shape)/t/1e9:7.2f} Gcell/s")
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:200]}")

# baseline: the 2D-kernel-like shape, 6 rolls
run((384, 384), [(-1,0),(1,0),(-1,1),(1,1),(-128,0),(128,0)], "384x384  mix6     ")
# same cell count, narrow lanes
run((1152, 128), [(-1,0),(1,0),(-1,1),(1,1),(-128,0),(128,0)], "1152x128 mix6     ")
# narrow lanes, no lane rolls
run((1152, 128), [(-1,0),(1,0),(-8,0),(8,0),(-128,0),(128,0)], "1152x128 sublane6 ")
# narrow lanes, only lane rolls
run((1152, 128), [(-1,1),(1,1),(-1,1),(1,1),(-1,1),(1,1)], "1152x128 lane6    ")
# wide lanes, only lane rolls
run((384, 384), [(-1,1),(1,1),(-1,1),(1,1),(-1,1),(1,1)], "384x384  lane6    ")
# wide lanes, only sublane rolls
run((384, 384), [(-1,0),(1,0),(-1,0),(1,0),(-1,0),(1,0)], "384x384  sublane6 ")
# no rolls at all (pure elementwise)
run((1152, 128), [], "1152x128 none     ")
run((384, 384), [], "384x384  none     ")
