"""Fused collide-stream kernel, manual-DMA variant.

The block-mapped kernel (collide_stream.py) over-fetches y-halos as full
neighbor blocks because Mosaic's block-shape rules forbid thin sublane
strips -- its HBM read amplification is ~(3 + 4/TX).  This variant keeps the
populations in HBM (unblocked) and issues explicit async DMAs per tile into
a double-buffered VMEM halo tile, prefetching tile i+1 while computing tile
i.

DMA granularity constraints shape the pieces: HBM slices must be 8-aligned
along the sublane (y) dimension, so
- x-halos are true one-deep strips (x is an untiled dimension),
- y-halos fetch the 8-row sublane block adjacent to the tile (the single
  needed row is its last/first row),
- and only the lattice directions that actually cross each face are
  fetched (per-channel DMAs; channels live on the untiled leading dim).

Read amplification at tile (8, 16) for D3Q19 is ~1.45x of the minimum
versus ~3.3x for the block-mapped kernel.  Wrap-around periodicity falls
out of modular piece offsets (thin pieces never straddle the boundary since
their starts stay 8-aligned).

Physics body is shared with the block-mapped kernel via
``_build_kernel_body(...).compute_from_ext``.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xlb_tpu.kernels.collide_stream import _build_kernel_body


def _channel_ranges(channels):
    """Group a sorted list of channel indices into contiguous (start, len)
    ranges so each becomes one DMA."""
    ranges = []
    for ch in channels:
        if ranges and ranges[-1][0] + ranges[-1][1] == ch:
            ranges[-1] = (ranges[-1][0], ranges[-1][1] + 1)
        else:
            ranges.append((ch, 1))
    return ranges


def build_fused_collide_stream_3d_dma(
    velocity_set,
    shape,
    collision="BGK",
    bc_specs=(),
    compute_dtype=jnp.float32,
    store_dtype=jnp.float32,
    tile=(8, 16),
    interpret=False,
    padded_halo=False,
    shifted=False,
    has_solids=True,
    force_vector=None,
    sub_grid=None,
    alias_output=False,
    ade=False,
    extern_force=False,
    logical_z=None,
):
    """``logical_z``: the domain's true z extent when ``shape[2]`` is an
    internally padded 128-multiple lane extent (pad columns are solid
    keep-out cells; lane rolls wrap at ``logical_z`` -- see
    collide_stream._roll_lane).

    With ``padded_halo=True`` the f input (and output) carry a TX-wide
    x-pad and TY-wide y-pad per side -- shape (q, X+2TX, Y+2TY, Z) around the
    (X, Y, Z) interior -- whose innermost layer/row holds neighbor-shard data
    from an ICI halo exchange.  Halo pieces then read fixed offsets into the
    pads instead of wrapping periodically, the output tiles stay
    block-aligned, and the returned array has the same padded shape so it can
    serve as a loop carry (used by xlb_tpu.parallel.pallas_distribute).
    ``shape`` is always the interior (X, Y, Z); masks stay unpadded.

    ``sub_grid=(oi, oj, gi, gj)`` restricts the kernel to the gi x gj tile
    rectangle starting at tile (oi, oj); with ``alias_output=True`` the step
    takes an extra ``out_init`` array donated as the output buffer, so
    several sub-grid calls can compose one full-domain update (the
    comm/compute-overlap split in parallel/pallas_distribute.py)."""
    X, Y, Z = shape
    TX, TY = tile
    q = velocity_set.q
    assert X % TX == 0 and Y % TY == 0, f"tile {tile} must divide domain {shape[:2]}"
    assert TY % 8 == 0, "TY must be a multiple of the sublane tile (8)"
    nX, nY = X // TX, Y // TY
    oi, oj, gi, gj = sub_grid if sub_grid is not None else (0, 0, nX, nY)
    assert 0 <= oi and oi + gi <= nX and 0 <= oj and oj + gj <= nY, f"sub_grid {sub_grid} out of range"
    n_tiles = gi * gj

    body = _build_kernel_body(velocity_set, collision, list(bc_specs), compute_dtype, store_dtype, TX, TY, shifted=shifted, has_solids=has_solids, force_vector=force_vector, ade=ade, extern_force=extern_force, logical_z=logical_z)
    compute_from_ext = body.compute_from_ext

    c = velocity_set._c
    all_ch = [(0, q)]
    ch_xlo = _channel_ranges(np.nonzero(c[0] == 1)[0].tolist())   # pulled from x-1
    ch_xhi = _channel_ranges(np.nonzero(c[0] == -1)[0].tolist())
    ch_ylo = _channel_ranges(np.nonzero(c[1] == 1)[0].tolist())
    ch_yhi = _channel_ranges(np.nonzero(c[1] == -1)[0].tolist())
    ch_c00 = _channel_ranges(np.nonzero((c[0] == 1) & (c[1] == 1))[0].tolist())
    ch_c01 = _channel_ranges(np.nonzero((c[0] == 1) & (c[1] == -1))[0].tolist())
    ch_c10 = _channel_ranges(np.nonzero((c[0] == -1) & (c[1] == 1))[0].tolist())
    ch_c11 = _channel_ranges(np.nonzero((c[0] == -1) & (c[1] == -1))[0].tolist())

    # buffer y-layout: [0:8) y-lo sublane block | [8 : 8+TY) interior |
    # [8+TY : 16+TY) y-hi block.  Interior y rows the kernel uses start at 7.
    BY = TY + 16
    # buffer x-layout: [0] x-lo strip | [1 : TX+1) interior | [TX+1] x-hi
    BX = TX + 2

    # piece table: (channel ranges, x-part, y-part); parts: 0=lo,1=mid,2=hi
    PIECE_TABLE = [
        (all_ch, 1, 1),
        (ch_xlo, 0, 1),
        (ch_xhi, 2, 1),
        (ch_ylo, 1, 0),
        (ch_yhi, 1, 2),
        (ch_c00, 0, 0),
        (ch_c01, 0, 2),
        (ch_c10, 2, 0),
        (ch_c11, 2, 2),
    ]
    pieces = []
    for ranges, px, py in PIECE_TABLE:
        for cstart, clen in ranges:
            pieces.append((cstart, clen, px, py))
    n_dmas = len(pieces)

    use_aux = body.use_aux
    cdt = compute_dtype

    def kernel(omega_ref, f_hbm, mask_ref, *rest):
        out, buf, sems = rest[-3:]  # alias_output adds an unread out_init input
        aux_val = rest[0][...].astype(cdt) if use_aux else None
        it = pl.program_id(0) * gj + pl.program_id(1)
        slot = jax.lax.rem(it, 2)
        nxt = jax.lax.rem(it + 1, 2)

        def piece_dma(slot_idx, linear_idx, k):
            i = oi + linear_idx // gj
            j = oj + jax.lax.rem(linear_idx, gj)
            cstart, clen, px, py = pieces[k]
            if padded_halo:
                # pad-relative offsets, never wrap (pads hold neighbor data)
                if px == 0:
                    xs, xlen, dx = TX + i * TX - 1, 1, 0
                elif px == 1:
                    xs, xlen, dx = TX + i * TX, TX, 1
                else:
                    xs, xlen, dx = TX + (i + 1) * TX, 1, TX + 1
                if py == 0:
                    ys, ylen, dy = pl.multiple_of(TY + j * TY - 8, 8), 8, 0
                elif py == 1:
                    ys, ylen, dy = pl.multiple_of(TY + j * TY, 8), TY, 8
                else:
                    ys, ylen, dy = pl.multiple_of(TY + (j + 1) * TY, 8), 8, TY + 8
                return pltpu.make_async_copy(
                    f_hbm.at[pl.ds(cstart, clen), pl.ds(xs, xlen), pl.ds(ys, ylen), :],
                    buf.at[slot_idx, pl.ds(cstart, clen), pl.ds(dx, xlen), pl.ds(dy, ylen), :],
                    sems.at[slot_idx, k],
                )
            if px == 0:
                xs, xlen, dx = jax.lax.rem(i * TX - 1 + X, X), 1, 0
            elif px == 1:
                xs, xlen, dx = i * TX, TX, 1
            else:
                xs, xlen, dx = jax.lax.rem((i + 1) * TX, X), 1, TX + 1
            if py == 0:  # 8-row sublane block ending at the needed row
                ys, ylen, dy = pl.multiple_of(jax.lax.rem(j * TY - 8 + Y, Y), 8), 8, 0
            elif py == 1:
                ys, ylen, dy = pl.multiple_of(j * TY, 8), TY, 8
            else:  # 8-row block starting at the needed row
                ys, ylen, dy = pl.multiple_of(jax.lax.rem((j + 1) * TY, Y), 8), 8, TY + 8
            return pltpu.make_async_copy(
                f_hbm.at[pl.ds(cstart, clen), pl.ds(xs, xlen), pl.ds(ys, ylen), :],
                buf.at[slot_idx, pl.ds(cstart, clen), pl.ds(dx, xlen), pl.ds(dy, ylen), :],
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

        def read_ext(l, x0, y0):
            # halo-tile offsets (0,1,2) -> buffer offsets: y interior starts
            # at 8, so the one-deep y-halo rows sit at 7 and TY+8
            ys = 7 + y0
            return buf[slot, l, x0 : x0 + TX, ys : ys + TY, :].astype(cdt)

        compute_from_ext(read_ext, mask_ref[...], out, cdt(omega_ref[0, 0]), aux_val)

    spec_mask = pl.BlockSpec((TX, TY, Z), lambda a, b: (oi + a, oj + b, 0))
    if padded_halo:
        out_shape = (q, X + 2 * TX, Y + 2 * TY, Z)
        out_spec = pl.BlockSpec((q, TX, TY, Z), lambda a, b: (0, oi + a + 1, oj + b + 1, 0))
    else:
        out_shape = (q, X, Y, Z)
        out_spec = pl.BlockSpec((q, TX, TY, Z), lambda a, b: (0, oi + a, oj + b, 0))
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # f stays in HBM, DMA'd manually
        spec_mask,
    ]
    if use_aux:
        # aux is static per-voxel data like the mask: block-mapped on the
        # UNPADDED interior tile even in padded_halo mode (the single-step
        # body only reads aux at the tile's own voxels)
        nchan = body.aux_nchan
        in_specs.append(pl.BlockSpec((nchan, TX, TY, Z), lambda i, j: (0, oi + i, oj + j, 0)))
    if alias_output:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY))  # out_init, aliased below
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(gi, gj),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, q, BX, BY, Z), store_dtype),
            pltpu.SemaphoreType.DMA((2, n_dmas)),
        ],
    )

    fused = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, store_dtype),
        interpret=interpret,
        input_output_aliases={(4 if use_aux else 3): 0} if alias_output else {},
        compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    def step(f, mask_i32, omega, out_init=None, aux=None):
        if padded_halo:
            assert f.shape[1:3] == (X + 2 * TX, Y + 2 * TY), (
                f"padded_halo kernel expects padded extents {(X + 2 * TX, Y + 2 * TY)}, got {f.shape[1:3]}"
            )
        omega_arr = jnp.asarray(omega, dtype=compute_dtype).reshape(1, 1)
        args = [omega_arr, f, mask_i32]
        if use_aux:
            assert aux is not None, "spatial-BC kernel needs the aux prescribed-velocity field"
            args.append(aux)
        if alias_output:
            assert out_init is not None, "alias_output kernel needs the output buffer to write into"
            args.append(out_init)
        return fused(*args)

    return step
