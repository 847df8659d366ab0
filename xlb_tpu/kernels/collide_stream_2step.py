"""k LBM steps per HBM pass (temporally blocked manual-DMA fused kernel).

The single-step fused kernel is bound by the Pallas DMA data path
(~300 GB/s on v5e -- see examples/performance/dma_experiments.py: even one
whole-array HBM->HBM DMA caps there, so the wall is the DMA engine path,
not kernel structure).  The only way past a traffic bound is less traffic:
this kernel advances the populations ``steps`` (k) timesteps per HBM round
trip, cutting per-step traffic to ~1/k.

Per (TX, TY) output tile it fetches a depth-k halo neighborhood, runs the
full collide-stream body (collide_stream._build_kernel_body.compute_from_ext
-- streaming, BC epilogues, collision, staging) on the extended
(TX+2(k-1), TY+2(k-1)) region into a VMEM intermediate, then sweeps again
on regions shrinking by one voxel per side until the core (TX, TY) region
lands in the output.  Every intermediate is cast to the storage dtype
between sweeps, so the result matches k invocations of the single-step
kernel to store-dtype roundoff -- not bitwise: FMA contraction varies with
slab shape, so isolated elements can round ~1 ulp apart (the parity oracle
in tests/kernels/test_fused_2step.py bounds this at 8 ulp + a high exact fraction).

DMA layout (generalizes the 2-step piece table -- widths change, structure
doesn't):

- x: the depth-1..k-1 halo strips are contiguous in HBM, so each side is
  ONE (k-1)-wide all-channel DMA; the depth-k strip only feeds the first
  sweep's edge pulls, so it fetches just the face-crossing directions.
- y: halo rows arrive as the adjacent 8-row sublane blocks (Mosaic DMA
  slices must be 8-aligned on the sublane dim), which already cover any
  halo depth <= 8 -- deeper temporal blocking costs NO extra y traffic.
- masks are needed on the depth-(k-1) extended region: (k-1)-wide x strips
  plus the same 8-row y blocks.

The VMEM working set (in + k-1 intermediates + out + masks) bounds the
usable (tile, k) combinations; the builder raises past ~100 MB.  This is
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

_VMEM_BUDGET = 100 * 1024 * 1024


def build_fused_collide_stream_3d_kstep(
    velocity_set,
    shape,
    collision="BGK",
    bc_specs=(),
    compute_dtype=jnp.float32,
    store_dtype=jnp.bfloat16,
    tile=(8, 16),
    steps=2,
    interpret=False,
    shifted=False,
    has_solids=True,
    force_vector=None,
    padded_halo=False,
    sub_grid=None,
    alias_output=False,
    logical_z=None,
):
    """Build a fused k-step: (f, mask_i32, omega) -> f after ``steps`` steps.

    With ``padded_halo=True`` both f and the packed mask carry TX/TY-wide
    pads per side holding neighbor-shard data (depth-k for f, depth-(k-1)
    for the mask) from an ICI halo exchange; pieces read fixed pad-relative
    offsets instead of wrapping, and the output keeps the padded shape so
    it can serve as a loop carry (see xlb_tpu.parallel.pallas_distribute).
    """
    X, Y, Z = shape
    TX, TY = tile
    K = int(steps)
    q = velocity_set.q
    assert K >= 2, f"temporal blocking needs steps >= 2, got {K}"
    assert K <= 8, "the 8-row y-halo blocks cover at most depth 8"
    assert X % TX == 0 and Y % TY == 0, f"tile {tile} must divide domain {shape[:2]}"
    assert TY % 8 == 0, "TY must be a multiple of the sublane tile (8)"
    assert Z % 128 == 0, "manual DMA slices need a 128-multiple lane extent"
    assert TX >= K, f"tile x-extent {TX} must cover the depth-{K} halo strips"
    nX, nY = X // TX, Y // TY
    oi, oj, gi, gj = sub_grid if sub_grid is not None else (0, 0, nX, nY)
    assert 0 <= oi and oi + gi <= nX and 0 <= oj and oj + gj <= nY, f"sub_grid {sub_grid} out of range"
    n_tiles = gi * gj

    body = _build_kernel_body(velocity_set, collision, list(bc_specs), compute_dtype, store_dtype, TX, TY, shifted=shifted, has_solids=has_solids, force_vector=force_vector, logical_z=logical_z)
    use_aux = body.use_aux
    nchan = body.aux_nchan if use_aux else 0
    compute_from_ext = body.compute_from_ext

    c = velocity_set._c
    all_ch = [(0, q)]
    ch_xlo = _channel_ranges(np.nonzero(c[0] == 1)[0].tolist())  # pulled from x-K
    ch_xhi = _channel_ranges(np.nonzero(c[0] == -1)[0].tolist())

    # f buffer layout: x [depth-K lo strip | (K-1)-wide lo strips | interior
    # TX | (K-1)-wide hi strips | depth-K hi strip],
    # y [8-row lo block | interior TY | 8-row hi block]
    BX, BY = TX + 2 * K, TY + 16
    # piece table: (channel ranges, x-part, y-part)
    # x-parts: 0 = depth-K lo strip, 1 = (K-1)-wide lo strip, 2 = interior,
    #          3 = (K-1)-wide hi strip, 4 = depth-K hi strip
    # y-parts: 0 = lo 8-block, 1 = interior, 2 = hi 8-block
    f_pieces = []
    for xp, ranges in ((0, ch_xlo), (1, all_ch), (2, all_ch), (3, all_ch), (4, ch_xhi)):
        for yp in (0, 1, 2):
            for cstart, clen in ranges:
                f_pieces.append((cstart, clen, xp, yp))

    # mask buffer layout: x [(K-1) lo | interior TX | (K-1) hi], y as above.
    # The static spatial-BC aux field needs the same depth-(K-1) extended
    # region as the mask, so its pieces mirror the mask's (all channels in
    # one DMA per piece; channels live on the untiled leading dim).
    BXm, BYm = TX + 2 * (K - 1), TY + 16
    m_pieces = [(xp, yp) for xp in (1, 2, 3) for yp in (0, 1, 2)]
    a_pieces = m_pieces if use_aux else []
    n_dmas = len(f_pieces) + len(m_pieces) + len(a_pieces)

    # intermediate sweep regions: sweep s (1-indexed) writes a region of
    # extent TX + 2*(K-s) per side; sweeps 1..K-1 land in VMEM intermediates
    inter_shapes = [(q, TX + 2 * (K - 1 - i), TY + 2 * (K - 1 - i), Z) for i in range(K - 1)]

    isz = np.dtype(store_dtype).itemsize
    vmem_est = (
        2 * q * BX * BY * Z * isz  # double-buffered input
        + 2 * BXm * BYm * Z * 4  # double-buffered packed mask
        # aux: double-buffered f32 blocks + per-sweep cast copies + epilogue
        # live ranges.  8x is deliberately conservative -- a 19-channel
        # (hybrid-distance) config measured >100 MB real scoped usage where
        # the old 2x accounting estimated 68 MB, and for aux-heavy scenes
        # k=1 measures faster than k=2 anyway (the depth-k aux halo refetch
        # eats the traffic saving), so rejecting k-steps there is also the
        # right performance call
        + 8 * nchan * BXm * BYm * Z * 4
        + sum(int(np.prod(s)) * isz for s in inter_shapes)
        + 2 * q * TX * TY * Z * isz  # pipelined output block
    )
    if vmem_est > _VMEM_BUDGET:
        raise ValueError(
            f"k-step working set ~{vmem_est / 2**20:.0f} MB exceeds the {_VMEM_BUDGET / 2**20:.0f} MB "
            f"VMEM budget (tile {tile}, steps {K}, Z {Z}, store {np.dtype(store_dtype).name})"
        )

    if padded_halo:

        def _x_src(i, xp):
            base = TX + i * TX
            if xp == 0:
                return base - K, 1, 0
            if xp == 1:
                return base - (K - 1), K - 1, 1
            if xp == 2:
                return base, TX, K
            if xp == 3:
                return base + TX, K - 1, TX + K
            return base + TX + K - 1, 1, TX + 2 * K - 1

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
                return jax.lax.rem(i * TX - K + X, X), 1, 0
            if xp == 1:
                return jax.lax.rem(i * TX - (K - 1) + X, X), K - 1, 1
            if xp == 2:
                return i * TX, TX, K
            if xp == 3:
                return jax.lax.rem((i + 1) * TX, X), K - 1, TX + K
            return jax.lax.rem((i + 1) * TX + K - 1, X), 1, TX + 2 * K - 1

        def _y_src(j, yp):
            if yp == 0:
                return pl.multiple_of(jax.lax.rem(j * TY - 8 + Y, Y), 8), 8, 0
            if yp == 1:
                return pl.multiple_of(j * TY, 8), TY, 8
            return pl.multiple_of(jax.lax.rem((j + 1) * TY, Y), 8), 8, TY + 8

    def kernel(omega_ref, f_hbm, mask_hbm, *rest):
        # inputs after mask: aux_hbm (use_aux), out_init (alias_output,
        # unread); then the out ref; then scratch: buf, mbuf, (abuf),
        # K-1 intermediates, sems
        n_tail = 3 + (1 if use_aux else 0) + (K - 1) + 1
        tail = rest[-n_tail:]
        out, buf, mbuf = tail[0], tail[1], tail[2]
        if use_aux:
            aux_hbm, abuf = rest[0], tail[3]
            inters = list(tail[4:-1])
        else:
            abuf = None
            inters = list(tail[3:-1])
        sems = tail[-1]
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
                return pltpu.make_async_copy(
                    f_hbm.at[pl.ds(cstart, clen), pl.ds(xs, xlen), pl.ds(ys, ylen), :],
                    buf.at[slot_idx, pl.ds(cstart, clen), pl.ds(dx, xlen), pl.ds(dy, ylen), :],
                    sems.at[slot_idx, k],
                )
            if k < len(f_pieces) + len(m_pieces):
                xp, yp = m_pieces[k - len(f_pieces)]
                xs, xlen, dx = _x_src(i, xp)
                ys, ylen, dy = _y_src(j, yp)
                # mask-buffer x-parts 1..3 sit one slot left of f's 1..3
                return pltpu.make_async_copy(
                    mask_hbm.at[pl.ds(xs, xlen), pl.ds(ys, ylen), :],
                    mbuf.at[slot_idx, pl.ds(dx - 1, xlen), pl.ds(dy, ylen), :],
                    sems.at[slot_idx, k],
                )
            xp, yp = a_pieces[k - len(f_pieces) - len(m_pieces)]
            xs, xlen, dx = _x_src(i, xp)
            ys, ylen, dy = _y_src(j, yp)
            return pltpu.make_async_copy(
                aux_hbm.at[:, pl.ds(xs, xlen), pl.ds(ys, ylen), :],
                abuf.at[slot_idx, :, pl.ds(dx - 1, xlen), pl.ds(dy, ylen), :],
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

        for s in range(1, K + 1):
            ext = TX + 2 * (K - s), TY + 2 * (K - s)  # sweep-s output extent

            if s == 1:
                # buffer coords: extended voxel x=-(K-1) is buf x 1, row
                # -(K-1) is buf y 8-(K-1); pulls reach one deeper each side
                def read(l, x0, y0, _e=ext):
                    return buf[slot, l, x0 : x0 + _e[0], y0 + (8 - K) : y0 + (8 - K) + _e[1], :].astype(cdt)
            else:
                src = inters[s - 2]

                def read(l, x0, y0, _src=src, _e=ext):
                    return _src[l, x0 : x0 + _e[0], y0 : y0 + _e[1], :].astype(cdt)

            # mask-buffer coords: extended voxel x=-(K-1) is mbuf x 0,
            # row -(K-1) is mbuf y 8-(K-1); the aux buffer shares the layout
            mask_s = mbuf[slot, s - 1 : s - 1 + ext[0], 8 - K + s : 8 - K + s + ext[1], :]
            aux_s = None
            if use_aux:
                aux_s = abuf[slot, :, s - 1 : s - 1 + ext[0], 8 - K + s : 8 - K + s + ext[1], :].astype(cdt)
            dst = out if s == K else inters[s - 1]
            compute_from_ext(read, mask_s, dst, omega, aux_s)

    if padded_halo:
        out_shape = (q, X + 2 * TX, Y + 2 * TY, Z)
        out_spec = pl.BlockSpec((q, TX, TY, Z), lambda a, b: (0, oi + a + 1, oj + b + 1, 0))
    else:
        out_shape = (q, X, Y, Z)
        out_spec = pl.BlockSpec((q, TX, TY, Z), lambda a, b: (0, oi + a, oj + b, 0))
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # f stays in HBM
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # packed mask stays in HBM
    ]
    if use_aux:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY))  # aux stays in HBM
    if alias_output:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY))  # out_init, aliased below
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(gi, gj),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, q, BX, BY, Z), store_dtype),
            pltpu.VMEM((2, BXm, BYm, Z), jnp.int32),
        ]
        + ([pltpu.VMEM((2, nchan, BXm, BYm, Z), jnp.float32)] if use_aux else [])
        + [pltpu.VMEM(s, store_dtype) for s in inter_shapes]
        + [pltpu.SemaphoreType.DMA((2, n_dmas))],
    )

    fusedk = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, store_dtype),
        interpret=interpret,
        input_output_aliases={(4 if use_aux else 3): 0} if alias_output else {},
        compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET + 8 * 2**20),
    )

    def stepk(f, mask_i32, omega, out_init=None, aux=None):
        if padded_halo:
            assert f.shape[1:3] == (X + 2 * TX, Y + 2 * TY) and mask_i32.shape[:2] == (X + 2 * TX, Y + 2 * TY)
        omega_arr = jnp.asarray(omega, dtype=compute_dtype).reshape(1, 1)
        args = [omega_arr, f, mask_i32]
        if use_aux:
            assert aux is not None, "spatial-BC kernel needs the aux prescribed-velocity field"
            if padded_halo:
                assert aux.shape[1:3] == (X + 2 * TX, Y + 2 * TY), "padded_halo k-step expects a pad-extended aux field"
            args.append(aux.astype(jnp.float32))
        if alias_output:
            assert out_init is not None, "alias_output kernel needs the output buffer to write into"
            args.append(out_init)
        return fusedk(*args)

    return stepk


def build_fused_collide_stream_3d_2step(*args, **kwargs):
    """Two LBM steps per HBM pass (k-step kernel at steps=2)."""
    kwargs.setdefault("steps", 2)
    return build_fused_collide_stream_3d_kstep(*args, **kwargs)
