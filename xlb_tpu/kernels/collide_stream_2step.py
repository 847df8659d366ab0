"""Two LBM steps per HBM pass (manual-DMA fused kernel).

The single-step fused kernel is bound by the Pallas DMA data path
(~300 GB/s on v5e -- see examples/performance/dma_experiments.py: even one
whole-array HBM->HBM DMA caps there, so the wall is the DMA engine path,
not kernel structure).  The only way past a traffic bound is less traffic:
this kernel advances the populations TWO steps per HBM round trip.

Per (TX, TY) output tile it fetches a depth-2 halo neighborhood, runs the
full collide-stream body (collide_stream._build_kernel_body.compute_from_ext
-- streaming, BC epilogues, collision, staging) on the extended
(TX+2, TY+2) region into a VMEM intermediate, then runs it again on the
core region reading from that intermediate.  The intermediate is cast to
the storage dtype between sweeps, so the result is bit-identical to two
invocations of the single-step kernel (the parity oracle in
tests/kernels/test_fused_2step.py).

HBM traffic per two steps (D3Q19, tile (8,16), bf16): ~4.9 MB per tile vs
~6.4 MB for two single-step passes -> ~1.4x.  Halo pieces follow the same
Mosaic DMA granularity rules as collide_stream_dma.py: 8-row sublane
blocks for y (one block covers both halo rows), one-deep x strips (depth-2
x channels fetch only the directions that cross two faces).

The VMEM working set (in + intermediate + out + masks) only fits 16-bit
storage at useful tile sizes; the builder asserts accordingly.  This is
the TPU analogue of temporal blocking in stencil codes; the reference has
no counterpart (its fused Warp kernel is one step per pass,
nse_stepper.py:427-466).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xlb_tpu.kernels.collide_stream import _build_kernel_body
from xlb_tpu.kernels.collide_stream_dma import _channel_ranges


def build_fused_collide_stream_3d_2step(
    velocity_set,
    shape,
    collision="BGK",
    bc_specs=(),
    compute_dtype=jnp.float32,
    store_dtype=jnp.bfloat16,
    tile=(8, 16),
    interpret=False,
    shifted=False,
    has_solids=True,
    force_vector=None,
    padded_halo=False,
    sub_grid=None,
    alias_output=False,
):
    """Build a fused DOUBLE step: (f, mask_i32, omega) -> f after 2 steps.

    With ``padded_halo=True`` both f and the packed mask carry TX/TY-wide
    pads per side holding neighbor-shard data (depth-2 for f, depth-1 for
    the mask) from an ICI halo exchange; pieces read fixed pad-relative
    offsets instead of wrapping, and the output keeps the padded shape so
    it can serve as a loop carry (see xlb_tpu.parallel.pallas_distribute).
    """
    X, Y, Z = shape
    TX, TY = tile
    q = velocity_set.q
    assert X % TX == 0 and Y % TY == 0, f"tile {tile} must divide domain {shape[:2]}"
    assert TY % 8 == 0, "TY must be a multiple of the sublane tile (8)"
    assert Z % 128 == 0, "manual DMA slices need a 128-multiple lane extent"
    nX, nY = X // TX, Y // TY
    oi, oj, gi, gj = sub_grid if sub_grid is not None else (0, 0, nX, nY)
    assert 0 <= oi and oi + gi <= nX and 0 <= oj and oj + gj <= nY, f"sub_grid {sub_grid} out of range"
    n_tiles = gi * gj
    TXe, TYe = TX + 2, TY + 2  # step-1 (intermediate) region

    body = _build_kernel_body(velocity_set, collision, list(bc_specs), compute_dtype, store_dtype, TX, TY, shifted=shifted, has_solids=has_solids, force_vector=force_vector)
    if body.use_aux:
        raise NotImplementedError("spatial-BC aux field is not plumbed through the 2-step kernel; use the single-step path")
    compute_from_ext = body.compute_from_ext

    c = velocity_set._c
    all_ch = [(0, q)]
    ch_xlo = _channel_ranges(np.nonzero(c[0] == 1)[0].tolist())  # pulled from x-2
    ch_xhi = _channel_ranges(np.nonzero(c[0] == -1)[0].tolist())

    # f buffer layout: x [x-2 | x-1 | interior TX | x+TX | x+TX+1],
    # y [8-row lo block | interior TY | 8-row hi block]
    BX, BY = TX + 4, TY + 16
    # piece table: (channel ranges, x-part, y-part)
    # x-parts: 0 = depth-2 lo strip, 1 = depth-1 lo strip, 2 = interior,
    #          3 = depth-1 hi strip, 4 = depth-2 hi strip
    # y-parts: 0 = lo 8-block, 1 = interior, 2 = hi 8-block
    f_pieces = []
    for xp, ranges in ((0, ch_xlo), (1, all_ch), (2, all_ch), (3, all_ch), (4, ch_xhi)):
        for yp in (0, 1, 2):
            for cstart, clen in ranges:
                f_pieces.append((cstart, clen, xp, yp))

    # mask buffer layout: x [x-1 | interior TX | x+TX], y as above
    BXm, BYm = TX + 2, TY + 16
    m_pieces = [(xp, yp) for xp in (1, 2, 3) for yp in (0, 1, 2)]
    n_dmas = len(f_pieces) + len(m_pieces)

    if padded_halo:
        assert TX >= 2, "padded_halo needs a TX >= 2 pad for the depth-2 x-halo"

        def _x_src(i, xp):
            base = TX + i * TX
            if xp == 0:
                return base - 2, 1, 0
            if xp == 1:
                return base - 1, 1, 1
            if xp == 2:
                return base, TX, 2
            if xp == 3:
                return base + TX, 1, TX + 2
            return base + TX + 1, 1, TX + 3

        def _y_src(j, yp):
            base = TY + j * TY
            if yp == 0:
                return pl.multiple_of(base - 8, 8), 8, 0
            if yp == 1:
                return pl.multiple_of(base, 8), TY, 8
            return pl.multiple_of(base + TY, 8), 8, TY + 8
    else:

        def _x_src(i, xp):
            if xp == 0:
                return jax.lax.rem(i * TX - 2 + X, X), 1, 0
            if xp == 1:
                return jax.lax.rem(i * TX - 1 + X, X), 1, 1
            if xp == 2:
                return i * TX, TX, 2
            if xp == 3:
                return jax.lax.rem((i + 1) * TX, X), 1, TX + 2
            return jax.lax.rem((i + 1) * TX + 1, X), 1, TX + 3

        def _y_src(j, yp):
            if yp == 0:
                return pl.multiple_of(jax.lax.rem(j * TY - 8 + Y, Y), 8), 8, 0
            if yp == 1:
                return pl.multiple_of(j * TY, 8), TY, 8
            return pl.multiple_of(jax.lax.rem((j + 1) * TY, Y), 8), 8, TY + 8

    def kernel(omega_ref, f_hbm, mask_hbm, *rest):
        out, buf, mbuf, inter, sems = rest[-5:]  # alias_output adds an unread out_init input
        it = pl.program_id(0) * gj + pl.program_id(1)
        slot = jax.lax.rem(it, 2)
        nxt = jax.lax.rem(it + 1, 2)

        def piece_dma(slot_idx, linear_idx, k):
            i = oi + linear_idx // gj
            j = oj + jax.lax.rem(linear_idx, gj)
            if k < len(f_pieces):
                cstart, clen, xp, yp = f_pieces[k]
                xs, xlen, dx = _x_src(i, xp)
                ys, ylen, dy = _y_src(j, yp)
                # mask-buffer x-parts 1..3 sit one slot left of f's 1..3
                return pltpu.make_async_copy(
                    f_hbm.at[pl.ds(cstart, clen), pl.ds(xs, xlen), pl.ds(ys, ylen), :],
                    buf.at[slot_idx, pl.ds(cstart, clen), pl.ds(dx, xlen), pl.ds(dy, ylen), :],
                    sems.at[slot_idx, k],
                )
            xp, yp = m_pieces[k - len(f_pieces)]
            xs, xlen, dx = _x_src(i, xp)
            ys, ylen, dy = _y_src(j, yp)
            return pltpu.make_async_copy(
                mask_hbm.at[pl.ds(xs, xlen), pl.ds(ys, ylen), :],
                mbuf.at[slot_idx, pl.ds(dx - 1, xlen), pl.ds(dy, ylen), :],
                sems.at[slot_idx, k],
            )

        @pl.when(it == 0)
        def _():
            for k in range(n_dmas):
                piece_dma(slot, it, k).start()

        @pl.when(it + 1 < n_tiles)
        def _():
            for k in range(n_dmas):
                piece_dma(nxt, it + 1, k).start()

        for k in range(n_dmas):
            piece_dma(slot, it, k).wait()

        cdt = compute_dtype
        omega = cdt(omega_ref[0, 0])

        # ---- step 1: extended (TXe, TYe) region -> VMEM intermediate ------
        # buffer coords: extended voxel x=-1 is buf x 1, row -1 is buf y 7
        def read1(l, x0, y0):
            return buf[slot, l, x0 : x0 + TXe, y0 + 6 : y0 + 6 + TYe, :].astype(cdt)

        mask_ext = mbuf[slot, 0:TXe, 7 : 7 + TYe, :]
        compute_from_ext(read1, mask_ext, inter, omega)

        # ---- step 2: core (TX, TY) region from the intermediate -----------
        def read2(l, x0, y0):
            return inter[l, x0 : x0 + TX, y0 : y0 + TY, :].astype(cdt)

        mask_core = mbuf[slot, 1 : TX + 1, 8 : TY + 8, :]
        compute_from_ext(read2, mask_core, out, omega)

    if padded_halo:
        out_shape = (q, X + 2 * TX, Y + 2 * TY, Z)
        out_spec = pl.BlockSpec((q, TX, TY, Z), lambda a, b: (0, oi + a + 1, oj + b + 1, 0))
    else:
        out_shape = (q, X, Y, Z)
        out_spec = pl.BlockSpec((q, TX, TY, Z), lambda a, b: (0, oi + a, oj + b, 0))
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),  # f stays in HBM
        pl.BlockSpec(memory_space=pltpu.ANY),  # packed mask stays in HBM
    ]
    if alias_output:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))  # out_init, aliased below
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(gi, gj),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, q, BX, BY, Z), store_dtype),
            pltpu.VMEM((2, BXm, BYm, Z), jnp.int32),
            pltpu.VMEM((q, TXe, TYe, Z), store_dtype),
            pltpu.SemaphoreType.DMA((2, n_dmas)),
        ],
    )

    fused2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, store_dtype),
        interpret=interpret,
        input_output_aliases={3: 0} if alias_output else {},
        compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    def step2(f, mask_i32, omega, out_init=None):
        if padded_halo:
            assert f.shape[1:3] == (X + 2 * TX, Y + 2 * TY) and mask_i32.shape[:2] == (X + 2 * TX, Y + 2 * TY)
        omega_arr = jnp.asarray(omega, dtype=compute_dtype).reshape(1, 1)
        if alias_output:
            assert out_init is not None, "alias_output kernel needs the output buffer to write into"
            return fused2(omega_arr, f, mask_i32, out_init)
        return fused2(omega_arr, f, mask_i32)

    return step2
