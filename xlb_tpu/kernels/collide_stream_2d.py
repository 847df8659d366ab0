"""Fused 2D collide-stream Pallas kernels (single-step and k-step).

Layout (q, X, Y): X on sublanes, Y on lanes.  Tiles span full Y so y pulls
are lane rolls (periodic); x halos arrive as 8-row sublane-aligned neighbor
blocks (Mosaic forbids 1-row sublane strips) of which only the adjacent row
is used -- read amplification 1 + 16/TX.

Temporal blocking is nearly free in 2D: the 8-row halo blocks already
cover any pull depth <= 8 and y needs no halo at all, so the k-step kernel
(``build_fused_collide_stream_2d_kstep``) advances k LBM steps per HBM
pass from the SAME fetch as one step -- traffic drops ~1/k with only a
2(k-1)/TX-row recompute overhead.  Sweeps shrink one row per side per
step; intermediates round-trip the storage dtype, so the result matches k
single-step passes to store-dtype roundoff.

For very wide domains (Y > max_y_resident) fall back to the JAX tier; 2D
problems of that size are rare.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xlb_tpu.kernels.collide_stream import _build_kernel_body


def build_fused_collide_stream_2d(
    velocity_set,
    shape,
    collision="BGK",
    bc_specs=(),
    compute_dtype=jnp.float32,
    store_dtype=jnp.float32,
    tile_x=32,
    interpret=False,
    shifted=False,
    has_solids=True,
    force_vector=None,
    ade=False,
    extern_force=False,
    padded_halo=False,
):
    """With ``padded_halo=True`` the f input (and output) carry a TX-wide
    x-pad per side -- shape (q, X+2TX, Y) around the (X, Y) interior --
    whose innermost row holds neighbor-shard data from an ICI halo
    exchange; halo blocks then read fixed pad-relative offsets instead of
    wrapping, and the output keeps the padded shape so it can serve as a
    loop carry (xlb_tpu.parallel.pallas_distribute, 2-D meshes).  The mask
    (and aux) stay unpadded."""
    X, Y = shape
    TX = tile_x
    q = velocity_set.q
    assert X % TX == 0, f"tile_x {TX} must divide X {X}"
    assert TX % 8 == 0, "tile_x must be a multiple of the sublane tile (8)"
    nX = X // TX
    r = TX // 8
    nX8 = X // 8

    body = _build_kernel_body(velocity_set, collision, list(bc_specs), compute_dtype, store_dtype, TX, None, shifted=shifted, has_solids=has_solids, force_vector=force_vector, ade=ade, extern_force=extern_force)
    compute_from_ext = body.compute_from_ext
    cdt = compute_dtype

    use_aux = body.use_aux

    def kernel(omega_ref, center, xlo, xhi, mask_ref, *rest):
        out, ext = rest[-2:]
        aux_val = rest[0][...].astype(cdt) if use_aux else None
        ext[:, 1 : TX + 1, :] = center[...].astype(cdt)
        ext[:, 0:1, :] = xlo[:, 7:8, :].astype(cdt)
        ext[:, TX + 1 : TX + 2, :] = xhi[:, 0:1, :].astype(cdt)

        def read_ext(l, x0, y0):
            # y0 is always 1 in 2D (y handled by lane rolls)
            return ext[l, x0 : x0 + TX, :]

        compute_from_ext(read_ext, mask_ref[...], out, cdt(omega_ref[0, 0]), aux_val)

    if padded_halo:
        # pad-relative block offsets in the (q, X+2TX, Y) padded array:
        # interior tile i sits at rows TX + i*TX (block index i+1 in TX
        # units); halo blocks never wrap (pads hold neighbor data)
        f_specs = [
            pl.BlockSpec((q, TX, Y), lambda i: (0, i + 1, 0)),
            pl.BlockSpec((q, 8, Y), lambda i: (0, (i + 1) * r - 1, 0)),
            pl.BlockSpec((q, 8, Y), lambda i: (0, (i + 2) * r, 0)),
        ]
        out_specs = pl.BlockSpec((q, TX, Y), lambda i: (0, i + 1, 0))
        out_shape = (q, X + 2 * TX, Y)
    else:
        f_specs = [
            pl.BlockSpec((q, TX, Y), lambda i: (0, i, 0)),
            pl.BlockSpec((q, 8, Y), lambda i: (0, jax.lax.rem(i * r - 1 + nX8, nX8), 0)),
            pl.BlockSpec((q, 8, Y), lambda i: (0, jax.lax.rem((i + 1) * r, nX8), 0)),
        ]
        out_specs = pl.BlockSpec((q, TX, Y), lambda i: (0, i, 0))
        out_shape = (q, X, Y)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nX,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + f_specs
        + [pl.BlockSpec((TX, Y), lambda i: (i, 0))]
        + ([pl.BlockSpec((body.aux_nchan, TX, Y), lambda i: (0, i, 0))] if use_aux else []),
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((q, TX + 2, Y), compute_dtype)],
    )

    fused = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, store_dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    def step(f, mask_i32, omega, aux=None):
        if padded_halo:
            assert f.shape[1] == X + 2 * TX, f"padded_halo 2D kernel expects x extent {X + 2 * TX}, got {f.shape[1]}"
        omega_arr = jnp.asarray(omega, dtype=compute_dtype).reshape(1, 1)
        if use_aux:
            assert aux is not None, "spatial-BC kernel needs the aux prescribed-velocity field"
            return fused(omega_arr, f, f, f, mask_i32, aux)
        return fused(omega_arr, f, f, f, mask_i32)

    return step


def build_fused_collide_stream_2d_kstep(
    velocity_set,
    shape,
    collision="BGK",
    bc_specs=(),
    compute_dtype=jnp.float32,
    store_dtype=jnp.float32,
    tile_x=32,
    steps=2,
    interpret=False,
    shifted=False,
    has_solids=True,
    force_vector=None,
    padded_halo=False,
):
    """k LBM steps per HBM pass: (f, mask_i32, omega) -> f after ``steps``.

    Same fetch as the single-step kernel (the 8-row x-halo blocks cover any
    depth <= 8; y is lane-resident) plus two 8-row mask halo blocks for the
    extended-region BC lookups.

    With ``padded_halo=True``, f AND the packed mask (and aux) carry TX-wide
    x-pads per side holding neighbor-shard data (depth-K for f, depth-(K-1)
    for mask/aux) from an ICI halo exchange; blocks read fixed pad-relative
    offsets and the output keeps the padded shape (see
    xlb_tpu.parallel.pallas_distribute)."""
    X, Y = shape
    TX = tile_x
    K = int(steps)
    q = velocity_set.q
    assert 2 <= K <= 8, f"2D temporal blocking supports 2 <= steps <= 8, got {K}"
    assert X % TX == 0, f"tile_x {TX} must divide X {X}"
    assert TX % 8 == 0, "tile_x must be a multiple of the sublane tile (8)"
    nX = X // TX
    r = TX // 8
    nX8 = X // 8

    body = _build_kernel_body(velocity_set, collision, list(bc_specs), compute_dtype, store_dtype, TX, None, shifted=shifted, has_solids=has_solids, force_vector=force_vector)
    use_aux = body.use_aux
    nchan = body.aux_nchan if use_aux else 0
    compute_from_ext = body.compute_from_ext
    cdt = compute_dtype

    inter_shapes = [(q, TX + 2 * (K - 1 - i), Y) for i in range(K - 1)]

    def kernel(omega_ref, center, xlo, xhi, mlo, mhi, mask_ref, *rest):
        # inputs after mask: (acen, alo, ahi) when use_aux; then out +
        # scratch (ext, mext, [aext], intermediates)
        n_tail = 3 + (1 if use_aux else 0) + (K - 1)
        tail = rest[-n_tail:]
        out, ext, mext = tail[0], tail[1], tail[2]
        if use_aux:
            acen, alo, ahi = rest[0], rest[1], rest[2]
            aext = tail[3]
            inters = list(tail[4:])
        else:
            inters = list(tail[3:])
        # ext rows: [lo distance K..1 | interior TX | hi distance 1..K]
        ext[:, K : K + TX, :] = center[...].astype(cdt)
        ext[:, 0:K, :] = xlo[:, 8 - K : 8, :].astype(cdt)
        ext[:, TX + K : TX + 2 * K, :] = xhi[:, 0:K, :].astype(cdt)
        # mext rows: [lo distance K-1..1 | interior TX | hi distance 1..K-1]
        mext[K - 1 : K - 1 + TX, :] = mask_ref[...]
        if K > 1:
            mext[0 : K - 1, :] = mlo[8 - (K - 1) : 8, :]
            mext[TX + K - 1 : TX + 2 * (K - 1), :] = mhi[0 : K - 1, :]
        if use_aux:  # aux shares the mask's extended-region layout
            aext[:, K - 1 : K - 1 + TX, :] = acen[...].astype(cdt)
            if K > 1:
                aext[:, 0 : K - 1, :] = alo[:, 8 - (K - 1) : 8, :].astype(cdt)
                aext[:, TX + K - 1 : TX + 2 * (K - 1), :] = ahi[:, 0 : K - 1, :].astype(cdt)

        omega = cdt(omega_ref[0, 0])
        for s in range(1, K + 1):
            extent = TX + 2 * (K - s)
            if s == 1:

                def read(l, x0, y0, _e=extent):
                    return ext[l, x0 : x0 + _e, :]
            else:
                src = inters[s - 2]

                def read(l, x0, y0, _src=src, _e=extent):
                    return _src[l, x0 : x0 + _e, :].astype(cdt)

            mask_s = mext[s - 1 : s - 1 + extent, :]
            aux_s = aext[:, s - 1 : s - 1 + extent, :] if use_aux else None
            dst = out if s == K else inters[s - 1]
            compute_from_ext(read, mask_s, dst, omega, aux_s)

    if padded_halo:
        # pad-relative block offsets (interior tile i at rows TX + i*TX);
        # f, mask, AND aux are all pad-extended in this mode
        cen_map = lambda i: (0, i + 1, 0)  # noqa: E731
        lo_map = lambda i: (0, (i + 1) * r - 1, 0)  # noqa: E731
        hi_map = lambda i: (0, (i + 2) * r, 0)  # noqa: E731
        mcen_map = lambda i: (i + 1, 0)  # noqa: E731
        mlo_map = lambda i: ((i + 1) * r - 1, 0)  # noqa: E731
        mhi_map = lambda i: ((i + 2) * r, 0)  # noqa: E731
        out_shape = (q, X + 2 * TX, Y)
    else:
        cen_map = lambda i: (0, i, 0)  # noqa: E731
        lo_map = lambda i: (0, jax.lax.rem(i * r - 1 + nX8, nX8), 0)  # noqa: E731
        hi_map = lambda i: (0, jax.lax.rem((i + 1) * r, nX8), 0)  # noqa: E731
        mcen_map = lambda i: (i, 0)  # noqa: E731
        mlo_map = lambda i: (jax.lax.rem(i * r - 1 + nX8, nX8), 0)  # noqa: E731
        mhi_map = lambda i: (jax.lax.rem((i + 1) * r, nX8), 0)  # noqa: E731
        out_shape = (q, X, Y)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nX,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((q, TX, Y), cen_map),
            pl.BlockSpec((q, 8, Y), lo_map),
            pl.BlockSpec((q, 8, Y), hi_map),
            pl.BlockSpec((8, Y), mlo_map),
            pl.BlockSpec((8, Y), mhi_map),
            pl.BlockSpec((TX, Y), mcen_map),
        ]
        + (
            [
                pl.BlockSpec((nchan, TX, Y), cen_map),
                pl.BlockSpec((nchan, 8, Y), lo_map),
                pl.BlockSpec((nchan, 8, Y), hi_map),
            ]
            if use_aux
            else []
        ),
        out_specs=pl.BlockSpec((q, TX, Y), cen_map),
        scratch_shapes=[
            pltpu.VMEM((q, TX + 2 * K, Y), compute_dtype),
            pltpu.VMEM((TX + 2 * (K - 1), Y), jnp.int32),
        ]
        + ([pltpu.VMEM((nchan, TX + 2 * (K - 1), Y), compute_dtype)] if use_aux else [])
        + [pltpu.VMEM(s, store_dtype) for s in inter_shapes],
    )

    fusedk = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, store_dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    def stepk(f, mask_i32, omega, aux=None):
        if padded_halo:
            assert f.shape[1] == X + 2 * TX and mask_i32.shape[0] == X + 2 * TX, (
                "padded_halo 2D k-step expects pad-extended f and mask"
            )
        omega_arr = jnp.asarray(omega, dtype=compute_dtype).reshape(1, 1)
        if use_aux:
            assert aux is not None, "spatial-BC kernel needs the aux prescribed-velocity field"
            if padded_halo:
                assert aux.shape[1] == X + 2 * TX, "padded_halo 2D k-step expects a pad-extended aux field"
            return fusedk(omega_arr, f, f, f, mask_i32, mask_i32, mask_i32, aux, aux, aux)
        return fusedk(omega_arr, f, f, f, mask_i32, mask_i32, mask_i32)

    return stepk
