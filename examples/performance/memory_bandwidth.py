"""HBM bandwidth microbenchmark: XLA elementwise vs Pallas pipelined copies.

Findings on the v5e dev chip (256^3 x 19 channels, f32; 200-step
windows -- shorter windows fold a ~30-40 ms tunnel round trip into the
measurement and depress every number 8-25%):
- XLA fused scale-copy:            ~632 GB/s (read+write)
- Pallas pipelined copy (any blocking, single or double buffered,
  auto or manual DMA):             ~325 GB/s
- fused LBM kernel (f32 1-step):   8.3 ms/step = within 7% of the Pallas
                                   copy bound; collision math and BC
                                   epilogues are fully hidden.

Conclusion: the fused kernel is at the Pallas-DMA roofline.  Round-2
follow-up (dma_experiments.py): a single whole-array HBM->HBM DMA -- no
pipelining, no VMEM round trip, no kernel structure -- also caps at ~310
GB/s, as do 19 concurrent DMAs, manual double/triple buffering, and
manual output DMA.  The cap is the DMA path itself; the productive road
past it is LESS traffic (packed masks, 16-bit deviation-form storage,
and two LBM steps per HBM pass -- see kernels/collide_stream_2step.py).
"""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))

import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, q = 256, 19
f = jnp.ones((q, N, N, N), jnp.float32)
GB = q*N*N*N*4/1e9

# XLA-level copy (scale by 1.0000001 to prevent no-op)
iters = 200
@jax.jit
def xla_copy(x):
    return jax.lax.fori_loop(0, iters, lambda i, v: v * jnp.float32(1.0000001), x)
x = xla_copy(f); _=float(jnp.sum(x[0,0,0,:8]))
best=1e30
for r in range(3):
    t0=time.perf_counter(); x = xla_copy(x); _=float(jnp.sum(x[0,0,0,:8]))
    best=min(best,time.perf_counter()-t0)
print(f"XLA scale-copy: {best/iters*1e3:.3f} ms/step -> {2*GB/(best/iters):.0f} GB/s")

# pallas copy with various blockings
def copy_kernel(f_ref, out_ref):
    out_ref[...] = f_ref[...]
for blk, grid in [((1, 64, 64, N), (q, N//64, N//64)), ((1, 32, N, N), (q, N//32)), ((q, 8, 64, N), (N//8, N//64))]:
    nd = len(grid)
    if nd == 3:
        spec = pl.BlockSpec(blk, lambda a,b,c: (a,b,c,0))
    else:
        spec = pl.BlockSpec(blk, (lambda a,b: (0,a,b,0)) if blk[0]==q else (lambda a,b: (a,b,0,0)))
    try:
        fn = pl.pallas_call(copy_kernel, grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=grid, in_specs=[spec], out_specs=spec),
            out_shape=jax.ShapeDtypeStruct((q,N,N,N), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024))
        run = jax.jit(lambda x: jax.lax.fori_loop(0, iters, lambda i, v: fn(v), x))
        x = run(f); _=float(jnp.sum(x[0,0,0,:8]))
        best=1e30
        for r in range(3):
            t0=time.perf_counter(); x=run(x); _=float(jnp.sum(x[0,0,0,:8]))
            best=min(best,time.perf_counter()-t0)
        print(f"pallas copy blk={blk}: {best/iters*1e3:.3f} ms -> {2*GB/(best/iters):.0f} GB/s")
    except Exception as e:
        print(f"pallas copy blk={blk}: FAILED {str(e)[:80]}")
