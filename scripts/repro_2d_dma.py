"""Minimal repro: pallas_call DMA from an HBM (ANY) ref with dynamic
slices in TWO dims (x and y), as the blocked 3D VEP kernel issues.
Usage: python scripts/repro_2d_dma.py [mode]
  mode=2d   : .at[:, ds(x0, W), ds(y0, Wy)]  (the suspect)
  mode=x    : .at[:, ds(x0, W)]              (the known-good VE pattern)
  mode=loop : per-y-row loop of .at[:, ds(x0, W), ds(y0+r, 1)]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

mode = sys.argv[1] if len(sys.argv) > 1 else "2d"
N, X, Y, Z = 4, 64, 64, 128
W, Wy = 32, 40
nbx, nby = 2, 4
R, Ry = 32, 16


def kern(src_hbm, out_ref, scr, sem):
    i = pl.program_id(0)
    j = pl.program_id(1)
    x0 = jnp.clip(i * R - 4, 0, X - W)
    y0 = jnp.clip(j * Ry - 4, 0, Y - Wy)
    if mode == "2d":
        cp = pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(x0, W), pl.ds(y0, Wy)], scr, sem)
        cp.start()
        cp.wait()
    elif mode == "x":
        cp = pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(x0, W)], scr, sem)
        cp.start()
        cp.wait()
    else:  # loop
        def body(r, _):
            cp = pltpu.make_async_copy(
                src_hbm.at[:, pl.ds(x0, W), pl.ds(y0 + r, 1)],
                scr.at[:, :, pl.ds(r, 1)], sem)
            cp.start()
            cp.wait()
            return 0
        lax.fori_loop(0, Wy, body, 0)
    out_ref[...] = jnp.zeros_like(out_ref) + scr[0, :R, :Ry][None]


scr_shape = (N, W, Y, Z) if mode == "x" else (N, W, Wy, Z)
call = pl.pallas_call(
    kern,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nbx, nby),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, R, Ry, Z), lambda i, j: (0, i, j, 0)),
        scratch_shapes=[pltpu.VMEM(scr_shape, jnp.float32),
                        pltpu.SemaphoreType.DMA],
    ),
    out_shape=jax.ShapeDtypeStruct((1, X, Y, Z), jnp.float32),
    compiler_params=pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary")),
)

x = jnp.arange(N * X * Y * Z, dtype=jnp.float32).reshape(N, X, Y, Z) / 1e6
t0 = time.perf_counter()
fn = jax.jit(call).lower(x).compile()
print(f"mode={mode} compile {time.perf_counter()-t0:.1f}s", flush=True)
for rep in range(3):
    t0 = time.perf_counter()
    out = np.asarray(fn(x))
    print(f"run[{rep}] {time.perf_counter()-t0:.2f}s "
          f"finite={np.isfinite(out).all()} sum={out.sum():.3f}", flush=True)
print("PASS", flush=True)
