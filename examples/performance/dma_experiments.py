"""Data-path experiments: can any Pallas structure beat the ~325 GB/s cap?

Round-1 found every *pipelined* Pallas copy (auto or manual DMA, any
blocking, double buffered) caps at ~325 GB/s while an XLA fused scale-copy
hits ~632 GB/s on the same chip.  This script probes structural variants:

  A. one whole-array HBM->HBM DMA (no VMEM round trip, no pipeline)
  B. manual-DMA input + manual-DMA output (both double buffered)
  C. triple-buffered manual input DMA (more in-flight DMAs)
  D. per-tile DMA split into 4 concurrent channel-range DMAs
  E. XLA scale-copy baseline (for calibration through the tunnel)

Timing: jitted fori_loop windows (one dispatch), scalar-fetch sync.
"""

import sys as _sys, pathlib as _pl

_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))

import time
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, q = 256, 19
GB = q * N * N * N * 4 / 1e9  # one array pass
iters = 50


def bench(name, fn, x):
    run = jax.jit(lambda v: jax.lax.fori_loop(0, iters, lambda i, u: fn(u), v))
    x = run(x)
    _ = float(jnp.sum(x[0, 0, 0, :8]))
    best = 1e30
    for _r in range(3):
        t0 = time.perf_counter()
        x = run(x)
        _ = float(jnp.sum(x[0, 0, 0, :8]))
        best = min(best, time.perf_counter() - t0)
    ms = best / iters * 1e3
    print(f"{name}: {ms:.3f} ms -> {2 * GB / (best / iters):.0f} GB/s")
    return x


f = jnp.ones((q, N, N, N), jnp.float32)

# E. XLA baseline
@jax.jit
def xla_copy(x):
    return x * jnp.float32(1.0000001)

bench("E xla scale-copy", xla_copy, f)


# A. whole-array HBM->HBM single DMA
def hbm2hbm_kernel(x_ref, o_ref, sem):
    cp = pltpu.make_async_copy(x_ref, o_ref, sem)
    cp.start()
    cp.wait()

hbm2hbm = pl.pallas_call(
    hbm2hbm_kernel,
    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
    out_shape=jax.ShapeDtypeStruct((q, N, N, N), jnp.float32),
    scratch_shapes=[pltpu.SemaphoreType.DMA],
)
bench("A hbm->hbm 1 dma ", hbm2hbm, f)


# A2. whole-array HBM->HBM split into q concurrent DMAs
def hbm2hbm_q_kernel(x_ref, o_ref, sems):
    cps = [
        pltpu.make_async_copy(x_ref.at[pl.ds(c, 1)], o_ref.at[pl.ds(c, 1)], sems.at[c])
        for c in range(q)
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

hbm2hbm_q = pl.pallas_call(
    hbm2hbm_q_kernel,
    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
    out_shape=jax.ShapeDtypeStruct((q, N, N, N), jnp.float32),
    scratch_shapes=[pltpu.SemaphoreType.DMA((q,))],
)
bench("A2 hbm->hbm q dmas", hbm2hbm_q, f)


# B/C/D: manual-DMA pipelined copies over an x-strip grid
def make_manual(depth, n_split, manual_out, TX=8):
    nX = N // TX
    grid = (q, nX)

    def kernel(x_hbm, o_any, buf, obuf, isems, osems, osems_done):
        c = pl.program_id(0)
        i = pl.program_id(1)
        it = c * nX + i
        n_it = q * nX
        slot = jax.lax.rem(it, depth)

        def in_dma(s, linear, k):
            cc = linear // nX
            ii = jax.lax.rem(linear, nX)
            zlen = N // n_split
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(cc, 1), pl.ds(ii * TX, TX), :, pl.ds(k * zlen, zlen)],
                buf.at[s, :, :, :, pl.ds(k * zlen, zlen)],
                isems.at[s, k],
            )

        @pl.when(it == 0)
        def _():
            for d in range(depth - 1):
                for k in range(n_split):
                    in_dma(d, d, k).start()

        @pl.when(it + depth - 1 < n_it)
        def _():
            for k in range(n_split):
                in_dma(jax.lax.rem(it + depth - 1, depth), it + depth - 1, k).start()

        for k in range(n_split):
            in_dma(slot, it, k).wait()

        if manual_out:
            oslot = jax.lax.rem(it, 2)

            @pl.when(it >= 2)
            def _():
                pltpu.make_async_copy(obuf.at[oslot], obuf.at[oslot], osems_done.at[oslot]).wait()

            obuf[oslot] = buf[slot] * jnp.float32(1.0000001)
            cp = pltpu.make_async_copy(
                obuf.at[oslot],
                o_any.at[pl.ds(c, 1), pl.ds(i * TX, TX), :, :],
                osems_done.at[oslot],
            )
            cp.start()

            @pl.when(it >= n_it - 2)
            def _():
                cp.wait()
        else:
            o_any[...] = buf[slot] * jnp.float32(1.0000001)

    scratch = [
        pltpu.VMEM((depth, 1, TX, N, N), jnp.float32),
        pltpu.VMEM((2, 1, TX, N, N), jnp.float32),
        pltpu.SemaphoreType.DMA((depth, n_split)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if manual_out:
        out_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    else:
        out_spec = pl.BlockSpec((1, TX, N, N), lambda c, i: (c, i, 0, 0))
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=out_spec,
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((q, N, N, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )


for name, depth, n_split, manual_out in [
    ("B manual in+out db2", 2, 1, True),
    ("C manual in db3     ", 3, 1, False),
    ("C2 manual in db2    ", 2, 1, False),
    ("D manual in 4-split ", 2, 4, False),
    ("D2 in db3 + man out ", 3, 1, True),
]:
    try:
        bench(name, make_manual(depth, n_split, manual_out), f)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:120]}")
