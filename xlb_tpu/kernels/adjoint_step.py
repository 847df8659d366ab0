"""Fused Pallas adjoint (backward) sweep for the collide-stream step.

The adjoint of an LBM step is itself an LBM-like local sweep.  With the
forward written as f_out_l[y] = Phi_l(fs(y), fp(y), omega) where
fs_m(y) = f_m[y - c_m] (pull streaming) and fp_m(y) = f_m[y] (the
pre-streaming reads used by BC epilogues and the solid keep-out), the
chain rule gives, for the cotangent g of f_out,

    df_m[x] = (J_fs(y)^T g(y))_m  at y = x + c_m     (push-side gather)
            + (J_fp(x)^T g(x))_m                     (voxel-local term)

-- every term is a GATHER (no scatter-add, hence no atomics), so the whole
backward fits the same one-HBM-pass manual-DMA structure as the forward:

  sweep A: on the (TX+2, TY+2) extended region, recompute the forward's
    voxel-local physics from the primal (depth-2 halo fetch) and apply
    ``jax.vjp`` of ``pointwise_core`` to the cotangent tile (depth-1 halo
    fetch) -> per-voxel cotangents h_fs, h_fp (and per-voxel d/d-omega);
  sweep B: df_m[core x] = h_fs_m[x + c_m] + h_fp_m[x] (static slice +
    opposite lane roll per direction).

The Jacobian-transpose is never derived by hand: ``jax.vjp`` runs at trace
time inside the kernel body, so every collision model (BGK/KBC/LES),
forcing, and voxel-local BC epilogue the forward supports differentiates
automatically.  Extrapolation-outflow staging reads TANGENTIAL neighbors
raw_m[y - t] (|t| <= 1 per axis); these enter the VJP as a third input
category alongside fs/fp -- one extra slab per static (m, t) pair, read
from the same depth-2 primal halo (a tangential +1 x-offset needs the
depth-2 column exactly for the c_x = +1 channels the DMA already loads)
-- and sweep B adds the gather df_m[x] += h_st[x + t].  So every BC the
fused forward supports now has a fused backward.

The per-voxel omega cotangent rides an extra output channel (q) and is
reduced outside the kernel; summing inside over the extended region would
double-count the halo ring across tiles.

This has no reference counterpart (the reference's Warp kernels have no
backward at all; only its JAX tier is differentiable, at unfused cost).
Measured at 256^3 f32 (grad of a scalar loss through one step, fwd+bwd):
50 ms with this adjoint vs 137 ms through the jnp tier -- 2.7x.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xlb_tpu.kernels.collide_stream import _build_kernel_body, _roll_lane
from xlb_tpu.kernels.collide_stream_dma import _channel_ranges

ADJOINT_UNSUPPORTED_KINDS = ()


def adjoint_supported(bc_specs):
    """True when every BC epilogue is fused-adjoint eligible (all are,
    since round 4; the hook stays for future non-local epilogues)."""
    return all(s["kind"] not in ADJOINT_UNSUPPORTED_KINDS for s in bc_specs)


def staging_keys(bc_specs, velocity_set):
    """Static (m, x0, y0, tz) tuples of the tangential staging reads the
    forward's extrapolation-outflow epilogue performs (mirrors the loop in
    collide_stream.pointwise_core's staging section)."""
    c = velocity_set._c
    opp = velocity_set._opp_indices
    d, q = velocity_set.d, velocity_set.q
    keys = []
    for spec in bc_specs:
        if spec["kind"] != "extrapolation_outflow":
            continue
        n = spec["normal"]
        for l in range(q):
            m = int(opp[l])
            if d == 3:
                t = (int(n[0] + c[0, m]), int(n[1] + c[1, m]), int(n[2] + c[2, m]))
            else:
                t = (int(n[0] + c[0, m]), 0, int(n[1] + c[1, m]))
            if any(abs(tc) > 1 for tc in t):
                continue
            key = (m, 1 - t[0], 1 - t[1], t[2])
            if key not in keys:
                keys.append(key)
    return keys


def build_fused_adjoint_3d(
    velocity_set,
    shape,
    collision="BGK",
    bc_specs=(),
    compute_dtype=jnp.float32,
    store_dtype=jnp.float32,
    tile=(8, 16),
    interpret=False,
    has_solids=True,
    force_vector=None,
    shifted=False,
    logical_z=None,
):
    """Build the fused backward: (f_primal, g, mask_i32, omega[, aux]) ->
    (df (q,X,Y,Z), dom_field (X,Y,Z)); sum dom_field for the scalar
    omega cotangent.  ``f_primal`` is in the step's storage form
    (deviation form when ``shifted``); the cotangent g travels in the
    COMPUTE dtype on both sides, so reverse sweeps through 16-bit-storage
    windows never quantize gradients.  Spatial-BC aux channels ride a
    depth-1-halo side fetch like the mask and enter the per-voxel VJP as
    constants (prescriptions carry no gradient)."""
    X, Y, Z = shape
    TX, TY = tile
    q = velocity_set.q
    d = velocity_set.d
    assert d == 3, "fused adjoint is 3-D; 2-D configs use the jnp-tier VJP"
    assert X % TX == 0 and Y % TY == 0, f"tile {tile} must divide domain {shape[:2]}"
    assert TY % 8 == 0, "TY must be a multiple of the sublane tile (8)"
    assert Z % 128 == 0, "manual DMA slices need a 128-multiple lane extent"
    assert TX >= 2, "depth-2 primal halo needs TX >= 2"
    if not adjoint_supported(bc_specs):
        raise NotImplementedError("extrapolation_outflow staging is not voxel-local; use the jnp-tier VJP")
    nX, nY = X // TX, Y // TY
    n_tiles = nX * nY
    TXe, TYe = TX + 2, TY + 2

    body = _build_kernel_body(
        velocity_set, collision, list(bc_specs), compute_dtype, store_dtype, TX, TY,
        shifted=shifted, has_solids=has_solids, force_vector=force_vector,
        logical_z=logical_z,
    )
    use_aux = body.use_aux
    nchan = body.aux_nchan if use_aux else 0
    pointwise_core = body.pointwise_core

    c = velocity_set._c
    cdt = compute_dtype
    all_ch = [(0, q)]
    ch_xlo = _channel_ranges(np.nonzero(c[0] == 1)[0].tolist())
    ch_xhi = _channel_ranges(np.nonzero(c[0] == -1)[0].tolist())

    # the solid keep-out and any f_pre-reading BC make fp inputs live
    # (hybrid epilogues read f_pre in every method branch; extrapolation
    # outflow's streaming phase reads f_pre(opp))
    need_fp = has_solids or any(
        s["kind"] in ("do_nothing", "halfway", "hybrid", "extrapolation_outflow") for s in bc_specs
    )
    # tangential staged reads (extrapolation outflow): extra VJP inputs
    st_keys = staging_keys(bc_specs, velocity_set)

    # primal buffer: depth-2 x halo (K=2 layout), 8-row y blocks
    BXf, BYf = TX + 4, TY + 16
    f_pieces = []
    for xp, ranges in ((0, ch_xlo), (1, all_ch), (2, all_ch), (3, all_ch), (4, ch_xhi)):
        for yp in (0, 1, 2):
            for cstart, clen in ranges:
                f_pieces.append((cstart, clen, xp, yp))
    # cotangent buffer: depth-1 x halo, all channels (J^T mixes directions)
    BXg, BYg = TX + 2, TY + 16
    g_pieces = [(xp, yp) for xp in (1, 2, 3) for yp in (0, 1, 2)]
    # mask buffer: depth-1 (the extended region's ids/bitfields); the aux
    # field needs the same depth-1 extended region
    BXm, BYm = TX + 2, TY + 16
    m_pieces = [(xp, yp) for xp in (1, 2, 3) for yp in (0, 1, 2)]
    a_pieces = m_pieces if use_aux else []
    n_dmas = len(f_pieces) + len(g_pieces) + len(m_pieces) + len(a_pieces)

    def _x_src(i, xp):
        # K=2 x-parts: 0 = depth-2 lo, 1 = depth-1 lo, 2 = interior,
        # 3 = depth-1 hi, 4 = depth-2 hi (periodic wrap)
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

    def kernel(omega_ref, f_hbm, g_hbm, mask_hbm, *rest):
        if use_aux:
            aux_hbm = rest[0]
            df_out, dom_out, fbuf, gbuf, mbuf, abuf, hfs, hfp, hst, hom, sems = rest[1:]
        else:
            aux_hbm = abuf = None
            df_out, dom_out, fbuf, gbuf, mbuf, hfs, hfp, hst, hom, sems = rest
        it = pl.program_id(0) * nY + pl.program_id(1)
        slot = jax.lax.rem(it, 2)
        nxt = jax.lax.rem(it + 1, 2)

        def piece_dma(slot_idx, linear_idx, k):
            i = linear_idx // nY
            j = jax.lax.rem(linear_idx, nY)
            if k < len(f_pieces):
                cstart, clen, xp, yp = f_pieces[k]
                xs, xlen, dx = _x_src(i, xp)
                ys, ylen, dy = _y_src(j, yp)
                return pltpu.make_async_copy(
                    f_hbm.at[pl.ds(cstart, clen), pl.ds(xs, xlen), pl.ds(ys, ylen), :],
                    fbuf.at[slot_idx, pl.ds(cstart, clen), pl.ds(dx, xlen), pl.ds(dy, ylen), :],
                    sems.at[slot_idx, k],
                )
            if k < len(f_pieces) + len(g_pieces):
                xp, yp = g_pieces[k - len(f_pieces)]
                xs, xlen, dx = _x_src(i, xp)
                ys, ylen, dy = _y_src(j, yp)
                # g-buffer x-parts 1..3 sit one slot left of f's 1..3
                return pltpu.make_async_copy(
                    g_hbm.at[:, pl.ds(xs, xlen), pl.ds(ys, ylen), :],
                    gbuf.at[slot_idx, :, pl.ds(dx - 1, xlen), pl.ds(dy, ylen), :],
                    sems.at[slot_idx, k],
                )
            if k < len(f_pieces) + len(g_pieces) + len(m_pieces):
                xp, yp = m_pieces[k - len(f_pieces) - len(g_pieces)]
                xs, xlen, dx = _x_src(i, xp)
                ys, ylen, dy = _y_src(j, yp)
                return pltpu.make_async_copy(
                    mask_hbm.at[pl.ds(xs, xlen), pl.ds(ys, ylen), :],
                    mbuf.at[slot_idx, pl.ds(dx - 1, xlen), pl.ds(dy, ylen), :],
                    sems.at[slot_idx, k],
                )
            xp, yp = a_pieces[k - len(f_pieces) - len(g_pieces) - len(m_pieces)]
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

        omega = cdt(omega_ref[0, 0])

        # ---- sweep A: per-voxel J^T g on the extended region --------------
        # primal-buffer coords: extended voxel -1 is fbuf x 1 / row buf y 7
        def read_f(l, x0, y0):
            return fbuf[slot, l, x0 : x0 + TXe, y0 + 6 : y0 + 6 + TYe, :].astype(cdt)

        fs_ext = []
        for l in range(q):
            cx, cy, cz = int(c[0, l]), int(c[1, l]), int(c[2, l])
            fs_ext.append(_roll_lane(read_f(l, 1 - cx, 1 - cy), cz, logical=logical_z))
        fp_ext = tuple(fbuf[slot, l, 1 : 1 + TXe, 7 : 7 + TYe, :].astype(cdt) for l in range(q)) if need_fp else ()
        g_ext = tuple(gbuf[slot, l, 0:TXe, 7 : 7 + TYe, :].astype(cdt) for l in range(q))
        mask_ext = mbuf[slot, 0:TXe, 7 : 7 + TYe, :]
        # aux enters the VJP closure as a CONSTANT (prescriptions carry no
        # gradient), so the Jacobian-transpose ignores it automatically
        aux_ext = abuf[slot, :, 0:TXe, 7 : 7 + TYe, :].astype(cdt) if use_aux else None
        om_field = jnp.full((TXe, TYe, Z), omega, cdt)
        # staged tangential slabs, PRE-rolled along z outside the vjp
        # (pltpu.roll has no differentiation rule); the cotangent is then
        # un-rolled by -tz in sweep B
        st_ext = tuple(
            _roll_lane(read_f(m, x0, y0), tz, logical=logical_z) for (m, x0, y0, tz) in st_keys
        )

        def _staging_read_from(st):
            stmap = dict(zip(st_keys, st))
            return lambda m, x0, y0, tz: stmap[(m, x0, y0, tz)]

        if need_fp:

            def phi(fs, fp, st, om):
                outs = pointwise_core(
                    list(fs), lambda l: fp[l], mask_ext, om, aux_ext,
                    staging_read=_staging_read_from(st) if st_keys else None,
                )
                return tuple(outs)

            _, vjp_fn = jax.vjp(phi, tuple(fs_ext), fp_ext, st_ext, om_field)
            dfs, dfp, dst, dom = vjp_fn(g_ext)
        else:

            def phi(fs, st, om):
                outs = pointwise_core(
                    list(fs), None, mask_ext, om, aux_ext,
                    staging_read=_staging_read_from(st) if st_keys else None,
                )
                return tuple(outs)

            _, vjp_fn = jax.vjp(phi, tuple(fs_ext), st_ext, om_field)
            dfs, dst, dom = vjp_fn(g_ext)
            dfp = None

        for l in range(q):
            hfs[l] = dfs[l]
            if need_fp:
                hfp[l] = dfp[l]
        for k in range(len(st_keys)):
            hst[k] = dst[k]
        hom[...] = dom

        # ---- sweep B: gather df_m[x] = h_fs_m[x + c_m] (+ h_fp_m[x]) ------
        # cotangents leave in the COMPUTE dtype: quantizing gradients to a
        # 16-bit store dtype would silently degrade them relative to the
        # jnp-tier VJP fallback (advisor finding, round 2)
        df_acc = []
        for m in range(q):
            cx, cy, cz = int(c[0, m]), int(c[1, m]), int(c[2, m])
            dm = _roll_lane(hfs[m, 1 + cx : 1 + cx + TX, 1 + cy : 1 + cy + TY, :], -cz, logical=logical_z)
            if need_fp:
                dm = dm + hfp[m, 1 : 1 + TX, 1 : 1 + TY, :]
            df_acc.append(dm)
        # staged-slab cotangents: st(y) = raw_m[y - t] (t = (tx, ty, tz)
        # tangential, |t| <= 1), so raw_m[x] collects h_st[x + t] -- the
        # xy shifts stay within the TXe/TYe halo, z via the inverse roll
        for k, (m, x0, y0, tz) in enumerate(st_keys):
            tx, ty = 1 - x0, 1 - y0
            df_acc[m] = df_acc[m] + _roll_lane(
                hst[k, 1 + tx : 1 + tx + TX, 1 + ty : 1 + ty + TY, :], -tz, logical=logical_z
            )
        for m in range(q):
            df_out[m] = df_acc[m].astype(compute_dtype)
        dom_out[...] = hom[1 : 1 + TX, 1 : 1 + TY, :].astype(compute_dtype)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # primal f stays in HBM
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # cotangent g stays in HBM
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # packed mask stays in HBM
    ]
    if use_aux:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY))  # aux stays in HBM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nX, nY),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((q, TX, TY, Z), lambda i, j: (0, i, j, 0)),
            pl.BlockSpec((TX, TY, Z), lambda i, j: (i, j, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, q, BXf, BYf, Z), store_dtype),
            # cotangents stay in the compute dtype end to end: a 16-bit
            # round-trip here would quantize every reverse-sweep gradient
            pltpu.VMEM((2, q, BXg, BYg, Z), compute_dtype),
            pltpu.VMEM((2, BXm, BYm, Z), jnp.int32),
        ]
        + ([pltpu.VMEM((2, nchan, BXm, BYm, Z), jnp.float32)] if use_aux else [])
        + [
            pltpu.VMEM((q, TXe, TYe, Z), compute_dtype),
            pltpu.VMEM((q, TXe, TYe, Z) if need_fp else (1, 1, 1, Z), compute_dtype),
            pltpu.VMEM((len(st_keys), TXe, TYe, Z) if st_keys else (1, 1, 1, Z), compute_dtype),
            pltpu.VMEM((TXe, TYe, Z), compute_dtype),
            pltpu.SemaphoreType.DMA((2, n_dmas)),
        ],
    )

    adj = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q, X, Y, Z), compute_dtype),
            jax.ShapeDtypeStruct((X, Y, Z), compute_dtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )

    def backward(f_primal, g, mask_i32, omega, aux=None):
        omega_arr = jnp.asarray(omega, dtype=compute_dtype).reshape(1, 1)
        args = [omega_arr, f_primal, g.astype(compute_dtype), mask_i32]
        if use_aux:
            assert aux is not None, "spatial-BC adjoint needs the aux prescribed-velocity field"
            args.append(aux.astype(jnp.float32))
        df, dom_field = adj(*args)
        return df, dom_field

    return backward
