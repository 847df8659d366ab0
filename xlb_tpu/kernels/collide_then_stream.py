"""Fused collide-THEN-stream Pallas kernel (the multires finest-level step).

The multires stepper advances each level as collide -> (collision BCs) ->
stream -> (streaming BCs), with the finest level streaming through a ghost
ring exploded from the parent's post-collision state.  This kernel runs
that sub-step in one HBM round trip, against the jnp tier's ~6-8 passes
(collide intermediates, ghost merge, stream copy, BC selects).

With ``pair=True`` it advances BOTH finest sub-steps of a coarse step in
one pass (they share the same ghost ring -- zeroth-order-in-time coupling,
like the reference): sub-step A runs on a one-cell-extended region into a
VMEM intermediate (cast to the storage dtype, so the result is
bit-compatible with two single passes), sub-step B shrinks to the core
tile.  The block-mapped halo fetch already over-fetches depth-2 halos, so
the pair halves HBM traffic per sub-step at ~20% extra compute.

Design notes:

- The level state is a ghost-EXTENDED array (q, Xe, Ye, Ze) whose ring
  holds parent-exploded post-collision values.  Mask ring cells carry
  cell-type 254 (packed id 30): the kernel collides everything, then
  restores ring cells to their input values -- this also keeps the ring
  values intact through sub-step A of a pair, so sub-step B reads the same
  ghosts, exactly like the jnp tier.
- Any Ze works (z pulls are in-register lane rolls; ring cells make the
  wrap harmless).  Supported epilogues: fullway (collision step),
  equilibrium / do-nothing / halfway (streaming step), exact-difference
  forcing; other BCs fall back to the jnp tier (gated by the stepper).

TPU counterpart of the reference's fused multires kernels
(nse_multires_stepper.py:583-1110, finest_fused_pull :933).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xlb_tpu.kernels.collide_stream import (
    _build_kernel_body,
    _roll_lane,
    kernel_bc_id,
    kernel_sfv_id,
    kernel_solid_id,
    spec_uses_aux,
    unpack_bc_id,
)

SUPPORTED_KINDS = {"fullway", "equilibrium", "do_nothing", "halfway"}


def _build_cts_substep(vs, collision, bc_specs, compute_dtype, store_dtype, force_vector=None):
    """Shared collide-THEN-stream sub-step on (Ex, Ey, Ze) slabs.

    Returns ``substep(f_pre, packed_e, omega) -> f_s``: collides the whole
    slab (collision BCs + ghost-ring keep for cell-type 254), pull-streams,
    applies streaming BCs, and returns post-stream slabs shrunk by one cell
    per x/y side.  Used by both the block-mapped kernel below and the
    thin-piece pair kernel (build_fused_cts_pair_thin)."""
    from xlb_tpu.kernels.collide_stream import _build_kernel_body

    body = _build_kernel_body(vs, collision, [], compute_dtype, store_dtype, None, None, force_vector=None)
    moments, equilibrium, collide = body.moments, body.equilibrium, body.collide
    q, d = vs.q, vs.d
    c = vs._c
    opp = vs._opp_indices
    cdt = compute_dtype

    def substep(f_pre, packed_e, omega):
        bc_e = unpack_bc_id(packed_e, q)
        rho, u = moments(f_pre)
        feq = equilibrium(rho, u)
        f_pc = collide(f_pre, feq, omega)
        if force_vector is not None:
            u_f = [u[a] + cdt(force_vector[a]) for a in range(d)]
            feq_f = equilibrium(rho, u_f)
            f_pc = [f_pc[l] + (feq_f[l] - feq[l]) for l in range(q)]
        for spec in bc_specs:
            if spec["step"] != "collision":
                continue
            on = bc_e == kernel_bc_id(spec["id"], q)
            if spec["kind"] == "fullway":
                f_pc = [jnp.where(on, f_pre[opp[l]], f_pc[l]) for l in range(q)]
        # ghost ring (cell-type 254) keeps its exploded values; solid
        # voxels (255) freeze likewise -- the two top packed ids
        keep = bc_e >= kernel_sfv_id(q)
        f_pc = [jnp.where(keep, f_pre[l], f_pc[l]) for l in range(q)]

        Ex, Ey = f_pre[0].shape[0], f_pre[0].shape[1]
        f_s = []
        for l in range(q):
            cx, cy, cz = int(c[0, l]), int(c[1, l]), int(c[2, l])
            x0, y0 = 1 - cx, 1 - cy
            f_s.append(_roll_lane(f_pc[l][x0 : x0 + Ex - 2, y0 : y0 + Ey - 2, :], cz))

        packed = packed_e[1:-1, 1:-1, :]
        bc = unpack_bc_id(packed, q)

        def missing(l):
            return jax.lax.bitwise_and(jax.lax.shift_right_logical(packed, l), 1) == 1

        core = (slice(1, Ex - 1), slice(1, Ey - 1), slice(None))
        for spec in bc_specs:
            if spec["step"] != "streaming":
                continue
            on = bc == kernel_bc_id(spec["id"], q)
            kind = spec["kind"]
            if kind == "equilibrium":
                feq_p = spec["feq"]
                f_s = [jnp.where(on, cdt(feq_p[l]), f_s[l]) for l in range(q)]
            elif kind == "do_nothing":
                f_s = [jnp.where(on, f_pc[l][core], f_s[l]) for l in range(q)]
            elif kind == "halfway":
                mw = spec.get("mw")
                for l in range(q):
                    refl = f_pc[opp[l]][core] if mw is None else f_pc[opp[l]][core] + cdt(mw[l])
                    f_s[l] = jnp.where(jnp.logical_and(on, missing(l)), refl, f_s[l])
        # solid early-out: solid voxels (255 -> 31) end the sub-step with
        # their starting populations (reference Warp nse_stepper.py:440-441;
        # same freeze as the NSE tiers)
        solid = bc == kernel_solid_id(q)
        f_s = [jnp.where(solid, f_pre[l][core], f_s[l]) for l in range(q)]
        return f_s

    return substep


def build_fused_collide_then_stream(
    velocity_set,
    ext_shape,
    collision="BGK",
    bc_specs=(),
    compute_dtype=jnp.float32,
    store_dtype=jnp.float32,
    tile=(8, 8),
    interpret=False,
    force_vector=None,
    pair=False,
    shifted=False,
):
    """Build ``step(f_ext, mask_ext, omega) -> f_ext_new`` over the
    ghost-extended level array, advancing one sub-step (or two with
    ``pair=True``).  Ring outputs are garbage; the stepper slices the
    interior / refreshes the ring.  ``shifted=True`` stores populations in
    deviation form g = f - w (see build_fused_cts_pair_thin)."""
    vs = velocity_set
    q, d = vs.q, vs.d
    assert d == 3, "multires CTS kernel is 3-D (2-D multires runs on the jnp tier)"
    Xe, Ye, Ze = ext_shape
    TX, TY = tile
    W = 2 if pair else 1  # assembled halo width
    assert Xe % TX == 0 and Ye % TY == 0, f"tile {tile} must divide extended shape {ext_shape[:2]}"
    assert TX % W == 0 and TY >= W
    nX, nY = Xe // TX, Ye // TY
    c = vs._c
    opp = vs._opp_indices
    cdt = compute_dtype
    from xlb_tpu.kernels.collide_stream import spec_uses_aux

    for spec in bc_specs:
        if spec["kind"] not in SUPPORTED_KINDS or spec_uses_aux(spec):
            raise NotImplementedError(f"BC kind {spec['kind']!r} unsupported by the multires CTS kernel")

    substep = _build_cts_substep(vs, collision, bc_specs, compute_dtype, store_dtype, force_vector)

    def kernel(omega_ref, center, xlo, xhi, ylo, yhi, c00, c01, c10, c11,
               m_center, m_xlo, m_xhi, m_ylo, m_yhi, m_c00, m_c01, m_c10, m_c11,
               out, ext, mext):
        omega = cdt(omega_ref[0, 0])

        # ---- assemble W-wide halo slabs: f (compute dtype) + packed mask --
        ext[:, W : TX + W, W : TY + W, :] = center[...].astype(cdt)
        ext[:, 0:W, W : TY + W, :] = xlo[...].astype(cdt)
        ext[:, TX + W : TX + 2 * W, W : TY + W, :] = xhi[...].astype(cdt)
        ext[:, W : TX + W, 0:W, :] = ylo[:, :, TY - W : TY, :].astype(cdt)
        ext[:, W : TX + W, TY + W : TY + 2 * W, :] = yhi[:, :, 0:W, :].astype(cdt)
        ext[:, 0:W, 0:W, :] = c00[:, :, TY - W : TY, :].astype(cdt)
        ext[:, 0:W, TY + W : TY + 2 * W, :] = c01[:, :, 0:W, :].astype(cdt)
        ext[:, TX + W : TX + 2 * W, 0:W, :] = c10[:, :, TY - W : TY, :].astype(cdt)
        ext[:, TX + W : TX + 2 * W, TY + W : TY + 2 * W, :] = c11[:, :, 0:W, :].astype(cdt)
        mext[W : TX + W, W : TY + W, :] = m_center[...]
        mext[0:W, W : TY + W, :] = m_xlo[...]
        mext[TX + W : TX + 2 * W, W : TY + W, :] = m_xhi[...]
        mext[W : TX + W, 0:W, :] = m_ylo[:, TY - W : TY, :]
        mext[W : TX + W, TY + W : TY + 2 * W, :] = m_yhi[:, 0:W, :]
        mext[0:W, 0:W, :] = m_c00[:, TY - W : TY, :]
        mext[0:W, TY + W : TY + 2 * W, :] = m_c01[:, 0:W, :]
        mext[TX + W : TX + 2 * W, 0:W, :] = m_c10[:, TY - W : TY, :]
        mext[TX + W : TX + 2 * W, TY + W : TY + 2 * W, :] = m_c11[:, 0:W, :]

        w = vs._w
        if shifted:
            f_pre = [ext[l] + cdt(w[l]) for l in range(q)]
        else:
            f_pre = [ext[l] for l in range(q)]
        packed_e = mext[...]

        f_s = substep(f_pre, packed_e, omega)
        if pair:
            # storage-dtype round trip keeps bit-compatibility with two
            # single passes (the DEVIATION is what rounds when shifted).
            # Ring cells of the intermediate must carry the SAME ghost
            # values (both sub-steps share one explosion): A's post-stream
            # ring outputs are garbage, so restore them from the assembled
            # input before sub-step B.
            packed_mid = packed_e[1:-1, 1:-1, :]
            keep_mid = unpack_bc_id(packed_mid, q) == kernel_sfv_id(q)
            if shifted:
                f_mid = [
                    jnp.where(
                        keep_mid,
                        f_pre[l][1:-1, 1:-1, :],
                        (v - cdt(w[l])).astype(store_dtype).astype(cdt) + cdt(w[l]),
                    )
                    for l, v in enumerate(f_s)
                ]
            else:
                f_mid = [
                    jnp.where(keep_mid, f_pre[l][1:-1, 1:-1, :], v.astype(store_dtype).astype(cdt))
                    for l, v in enumerate(f_s)
                ]
            f_s = substep(f_mid, packed_mid, omega)

        for l in range(q):
            out[l] = (f_s[l] - cdt(w[l]) if shifted else f_s[l]).astype(store_dtype)

    def fmap(dx, dy, bx, by):
        def index_map(i, j):
            return (0, jax.lax.rem(dx(i) + Xe // bx, Xe // bx), jax.lax.rem(dy(j) + Ye // by, Ye // by), 0)

        return index_map

    def mmap(dx, dy, bx, by):
        def index_map(i, j):
            return (jax.lax.rem(dx(i) + Xe // bx, Xe // bx), jax.lax.rem(dy(j) + Ye // by, Ye // by), 0)

        return index_map

    rx = TX // W  # x-strip offsets in W-block units

    def nine(spec_fn, with_q):
        bq = (q,) if with_q else ()
        return [
            spec_fn((*bq, TX, TY, Ze), lambda i: i, lambda j: j, TX, TY),  # center
            spec_fn((*bq, W, TY, Ze), lambda i: i * rx - 1, lambda j: j, W, TY),  # x-lo
            spec_fn((*bq, W, TY, Ze), lambda i: (i + 1) * rx, lambda j: j, W, TY),  # x-hi
            spec_fn((*bq, TX, TY, Ze), lambda i: i, lambda j: j - 1, TX, TY),  # y-lo block
            spec_fn((*bq, TX, TY, Ze), lambda i: i, lambda j: j + 1, TX, TY),  # y-hi block
            spec_fn((*bq, W, TY, Ze), lambda i: i * rx - 1, lambda j: j - 1, W, TY),
            spec_fn((*bq, W, TY, Ze), lambda i: i * rx - 1, lambda j: j + 1, W, TY),
            spec_fn((*bq, W, TY, Ze), lambda i: (i + 1) * rx, lambda j: j - 1, W, TY),
            spec_fn((*bq, W, TY, Ze), lambda i: (i + 1) * rx, lambda j: j + 1, W, TY),
        ]

    f_specs = nine(lambda blk, dx, dy, bx, by: pl.BlockSpec(blk, fmap(dx, dy, bx, by)), with_q=True)
    m_specs = nine(lambda blk, dx, dy, bx, by: pl.BlockSpec(blk, mmap(dx, dy, bx, by)), with_q=False)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nX, nY),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + f_specs + m_specs,
        out_specs=pl.BlockSpec((q, TX, TY, Ze), lambda i, j: (0, i, j, 0)),
        scratch_shapes=[
            pltpu.VMEM((q, TX + 2 * W, TY + 2 * W, Ze), compute_dtype),
            pltpu.VMEM((TX + 2 * W, TY + 2 * W, Ze), jnp.int32),
        ],
    )

    fused = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((q, Xe, Ye, Ze), store_dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    def step(f_ext, mask_ext, omega):
        omega_arr = jnp.asarray(omega, dtype=compute_dtype).reshape(1, 1)
        return fused(omega_arr, *([f_ext] * 9), *([mask_ext] * 9))

    return step


_VMEM_BUDGET = 100 * 1024 * 1024


def build_fused_cts_pair_thin(
    velocity_set,
    ext_shape,
    collision="BGK",
    bc_specs=(),
    compute_dtype=jnp.float32,
    store_dtype=jnp.float32,
    tile=(16, 32),
    interpret=False,
    force_vector=None,
    coalesce_out=False,
    shifted=False,
    pair=True,
    ring_freeze=None,
):
    """Thin-piece collide-then-stream PAIR over a ring-extended level array.

    Both finest-level sub-steps of a coarse multires step in one HBM round
    trip, like ``pair=True`` above, but with a low-amplification fetch: the
    nine-spec trick fetches x-halos as 2-wide strips on the UNTILED leading
    dim and y-halos as the adjacent 8-row sublane blocks (block shapes with
    an 8-multiple sublane extent are Mosaic-legal; only 1-deep sublane
    strips are not), instead of full neighbor blocks.  Read amplification
    at tile (16, 32) is ~1.9x versus ~4.5x for the full-block fetch -- the
    difference between ~800 MLUPS and multi-GLUPS at 3-D multires scale
    (reference crown-jewel capability, nse_multires_stepper.py:933-1110).

    The grid covers ALL tiles of the extended array: ring cells (packed
    cell-type 30) re-emit their input values through the in-kernel keep, so
    the output is a full drop-in loop carry -- no per-step pad/crop, and
    per-axis ring widths only need to make the extents tile-divisible
    (models/multires.py chooses them).  Edge tiles' halo pieces wrap
    modularly; wrapped data only feeds ring-cell outputs.  Any lane extent
    works (no manual DMA -> no 128-multiple constraint).

    With ``coalesce_out=True`` the kernel ALSO emits the 2x2 x/y-summed
    core populations (q, Xe/2, Ye/2, Zl) as a second output -- most of the
    fine->coarse coalescence for free at write time, saving the separate
    full-array read the host-side average would cost (the caller finishes
    with a cheap z-pair sum on the 4x smaller array).  Requires even TX/2
    alignment: TX % 4 == 0... (TX, TY multiples of 2 and 16).

    With ``shifted=True`` the HBM-resident ext array holds populations in
    deviation form g_l = f_l - w_l (the same well-conditioning trick as the
    single-res kernels, collide_stream.py): loads add the lattice weight,
    stores subtract it, so 16-bit storage keeps its full mantissa on the
    physically-varying part.  The A->B storage round trip rounds the
    DEVIATION (bit-compatible with two shifted single passes), and the
    coalescence side output sums the store-rounded deviations -- the caller
    adds the weight back after its z-pair sum (models/multires.py::
    _avg_from_out2).  Ring faces written by the caller must be shifted the
    same way.

    With ``pair=False`` the kernel advances ONE sub-step (collide -> BCs ->
    stream -> BCs).  This is the COARSEST-level fast path: the level has no
    parent ring (pieces wrap modularly = true periodic streaming, matching
    the jnp tier's roll semantics), its refined cells carry packed
    cell-type 30 so they keep their pre-merged coalesced values through
    the collide and stream normally -- one HBM pass replaces the jnp
    collide + coalesce + stream + BC chain (models/multires.py::_advance).

    ``ring_freeze=(gx, gy, gz)`` (pair=False middle levels): cells whose
    GLOBAL ext coordinate lies in the outer ring re-emit their input value
    at the output instead of the streamed pull.  Without it ring outputs
    are garbage (edge pieces wrap modularly), forcing the caller to
    re-overlay the same parent faces before every sub-step -- a full
    read+write of the extended array each.  With it the faces persist in
    the carry, so a fused middle's TWO sub-steps (which share one parent
    explosion) need only ONE overlay per coarse step.  Coordinates (not
    packed cell-type 30) distinguish the ring from the refined region,
    which also carries 30 but must stream normally."""
    vs = velocity_set
    q, d = vs.q, vs.d
    assert d == 3, "the CTS pair kernel is 3-D"
    Xe, Ye, Zl = ext_shape
    TX, TY = tile
    assert Xe % TX == 0 and Ye % TY == 0, f"tile {tile} must divide extended shape {ext_shape[:2]}"
    assert TX % 2 == 0 and TY % 8 == 0, "TX must be even (2-wide x strips), TY an 8-multiple"
    assert Ye % 8 == 0, "the 8-row y-halo blocks must tile the y extent"
    if coalesce_out:
        # pair mode (finest level) or single-sub-step middle levels: the
        # 2x2 x/y-summed core rides out as a second output either way, so
        # the PARENT's coalescence reads the 4x smaller array instead of
        # the full child interior
        assert TY % 16 == 0 and Xe % 2 == 0, "coalesce_out needs 8-mult TY/2 sublanes"
    nX, nY = Xe // TX, Ye // TY
    cdt = compute_dtype

    for spec in bc_specs:
        if spec["kind"] not in SUPPORTED_KINDS or spec_uses_aux(spec):
            raise NotImplementedError(f"BC kind {spec['kind']!r} unsupported by the multires CTS kernel")

    substep = _build_cts_substep(vs, collision, bc_specs, compute_dtype, store_dtype, force_vector)

    isz = np.dtype(store_dtype).itemsize
    vmem_est = (
        2 * 2 * q * (TX * TY + 2 * 2 * TY + 2 * 8 * TX + 4 * 16) * Zl * isz  # in pieces (dbl-buffered)
        + q * (TX + 4) * (TY + 4) * Zl * 4  # assembled ext scratch (f32)
        + (TX + 4) * (TY + 4) * Zl * 4  # assembled mask scratch
        + (q * (TX + 2) * (TY + 2) * Zl * isz if pair else 0)  # A -> B intermediate
        + 2 * q * TX * TY * Zl * isz  # pipelined output
        # shifted 16-bit storage shrinks the piece/intermediate terms, which
        # lets the tile search pick areas whose f32 COMPUTE working set (not
        # modeled above) blows the Mosaic scoped-vmem stack: charge 2.5
        # ext-sized f32 slab sets as an empirical safety term (tile (28,32)
        # measured 120.8 MB actual vs a 97 MB estimate with only 1.0x;
        # the f32 store path keeps its proven tile selection unchanged)
        + (int(2.5 * q * (TX + 4) * (TY + 4) * Zl * 4) if shifted else 0)
    )
    if vmem_est > _VMEM_BUDGET:
        raise ValueError(
            f"CTS-pair working set ~{vmem_est / 2**20:.0f} MB exceeds {_VMEM_BUDGET / 2**20:.0f} MB "
            f"(tile {tile}, Zl {Zl}, store {np.dtype(store_dtype).name})"
        )

    def kernel(omega_ref, center, xlo, xhi, ylo, yhi, c00, c01, c10, c11,
               m_center, m_xlo, m_xhi, m_ylo, m_yhi, m_c00, m_c01, m_c10, m_c11,
               out, *rest):
        if coalesce_out:
            out2, ext, mext, *maybe_inter = rest
        else:
            (ext, mext, *maybe_inter), out2 = rest, None
        inter = maybe_inter[0] if maybe_inter else None
        omega = cdt(omega_ref[0, 0])

        # ---- assemble the depth-2 halo region (TX+4, TY+4) ---------------
        ext[:, 2 : TX + 2, 2 : TY + 2, :] = center[...].astype(cdt)
        ext[:, 0:2, 2 : TY + 2, :] = xlo[...].astype(cdt)
        ext[:, TX + 2 : TX + 4, 2 : TY + 2, :] = xhi[...].astype(cdt)
        ext[:, 2 : TX + 2, 0:2, :] = ylo[:, :, 6:8, :].astype(cdt)
        ext[:, 2 : TX + 2, TY + 2 : TY + 4, :] = yhi[:, :, 0:2, :].astype(cdt)
        ext[:, 0:2, 0:2, :] = c00[:, :, 6:8, :].astype(cdt)
        ext[:, 0:2, TY + 2 : TY + 4, :] = c01[:, :, 0:2, :].astype(cdt)
        ext[:, TX + 2 : TX + 4, 0:2, :] = c10[:, :, 6:8, :].astype(cdt)
        ext[:, TX + 2 : TX + 4, TY + 2 : TY + 4, :] = c11[:, :, 0:2, :].astype(cdt)
        mext[2 : TX + 2, 2 : TY + 2, :] = m_center[...]
        mext[0:2, 2 : TY + 2, :] = m_xlo[...]
        mext[TX + 2 : TX + 4, 2 : TY + 2, :] = m_xhi[...]
        mext[2 : TX + 2, 0:2, :] = m_ylo[:, 6:8, :]
        mext[2 : TX + 2, TY + 2 : TY + 4, :] = m_yhi[:, 0:2, :]
        mext[0:2, 0:2, :] = m_c00[:, 6:8, :]
        mext[0:2, TY + 2 : TY + 4, :] = m_c01[:, 0:2, :]
        mext[TX + 2 : TX + 4, 0:2, :] = m_c10[:, 6:8, :]
        mext[TX + 2 : TX + 4, TY + 2 : TY + 4, :] = m_c11[:, 0:2, :]

        w = vs._w
        if shifted:
            # unshift the assembled scratch IN PLACE: materializing
            # f = g + w as q separate f32 temporaries blows the Mosaic
            # scoped-vmem stack at wide tiles
            for l in range(q):
                ext[l] = ext[l] + cdt(w[l])
        f_pre = [ext[l] for l in range(q)]
        packed_A = mext[...]

        if pair:
            # sub-step A on (TX+4, TY+4) -> (TX+2, TY+2)
            f_s = substep(f_pre, packed_A, omega)

            # storage round trip + ring restore (both sub-steps share one
            # explosion; A's post-stream ring outputs are garbage).  The kept
            # branch reconstructs the stored deviation as (g + w) - w when
            # shifted (<= 1 f32 ulp of the raw g; the 16-bit store rounding
            # dominates), and reuses the raw value exactly otherwise.
            packed_mid = packed_A[1:-1, 1:-1, :]
            keep_mid = unpack_bc_id(packed_mid, q) >= kernel_sfv_id(q)
            for l in range(q):
                src = f_pre[l][1:-1, 1:-1, :]
                if shifted:
                    src = src - cdt(w[l])
                    new = (f_s[l] - cdt(w[l])).astype(store_dtype).astype(cdt)
                else:
                    new = f_s[l].astype(store_dtype).astype(cdt)
                inter[l] = jnp.where(keep_mid, src, new).astype(store_dtype)

            # sub-step B on (TX+2, TY+2) -> the (TX, TY) core
            f_mid = [
                inter[l].astype(cdt) + cdt(w[l]) if shifted else inter[l].astype(cdt) for l in range(q)
            ]
            f_core = substep(f_mid, packed_mid, omega)
        else:
            # single sub-step on the (TX+2, TY+2) view -> the (TX, TY) core
            f_core = substep([v[1:-1, 1:-1, :] for v in f_pre], packed_A[1:-1, 1:-1, :], omega)
            if ring_freeze is not None:
                # outer-ring cells re-emit their input: parent faces persist
                # in the carry across both sub-steps of a coarse step
                rgx, rgy, rgz = ring_freeze
                i, j = pl.program_id(0), pl.program_id(1)
                xg = jax.lax.broadcasted_iota(jnp.int32, (TX, TY, Zl), 0) + i * TX
                yg = jax.lax.broadcasted_iota(jnp.int32, (TX, TY, Zl), 1) + j * TY
                zg = jax.lax.broadcasted_iota(jnp.int32, (TX, TY, Zl), 2)
                ring = (xg < rgx) | (xg >= Xe - rgx) | (yg < rgy) | (yg >= Ye - rgy)
                if rgz:
                    ring = ring | (zg < rgz) | (zg >= Zl - rgz)
                f_core = [
                    jnp.where(ring, f_pre[l][2 : TX + 2, 2 : TY + 2, :], f_core[l]) for l in range(q)
                ]
        for l in range(q):
            v = (f_core[l] - cdt(w[l]) if shifted else f_core[l]).astype(store_dtype)
            out[l] = v
            if coalesce_out:
                # sum the STORE-rounded values (deviations when shifted --
                # the caller adds the weight back) so the host-side z-pair
                # sum reproduces models/multires._coalesce_avg bit-for-bit
                # in the f32 case.  Pair sums via reshape-split (Mosaic-
                # legal on the major and sublane dims); strided slices
                # lower to >2-D gathers and fail to compile.
                vc = v.astype(cdt)
                a = vc.reshape(TX // 2, 2, TY, Zl).sum(axis=1)
                out2[l] = (
                    a.reshape(TX // 2, TY // 2, 2, Zl).sum(axis=2).astype(cdt).astype(store_dtype)
                )

    # ---- nine thin specs --------------------------------------------------
    nx2, ny8 = Xe // 2, Ye // 8  # piece-block grids
    tx2, ty8 = TX // 2, TY // 8

    def f_spec(bx, by, dx, dy, gx, gy):
        return pl.BlockSpec(
            (q, bx, by, Zl),
            lambda i, j, _dx=dx, _dy=dy, _gx=gx, _gy=gy: (
                0, jax.lax.rem(_dx(i) + _gx, _gx), jax.lax.rem(_dy(j) + _gy, _gy), 0
            ),
        )

    def m_spec(bx, by, dx, dy, gx, gy):
        return pl.BlockSpec(
            (bx, by, Zl),
            lambda i, j, _dx=dx, _dy=dy, _gx=gx, _gy=gy: (
                jax.lax.rem(_dx(i) + _gx, _gx), jax.lax.rem(_dy(j) + _gy, _gy), 0
            ),
        )

    def nine(spec):
        return [
            spec(TX, TY, lambda i: i, lambda j: j, nX, nY),                  # center
            spec(2, TY, lambda i: i * tx2 - 1, lambda j: j, nx2, nY),        # x-lo strip
            spec(2, TY, lambda i: (i + 1) * tx2, lambda j: j, nx2, nY),      # x-hi strip
            spec(TX, 8, lambda i: i, lambda j: j * ty8 - 1, nX, ny8),        # y-lo 8-row block
            spec(TX, 8, lambda i: i, lambda j: (j + 1) * ty8, nX, ny8),      # y-hi 8-row block
            spec(2, 8, lambda i: i * tx2 - 1, lambda j: j * ty8 - 1, nx2, ny8),
            spec(2, 8, lambda i: i * tx2 - 1, lambda j: (j + 1) * ty8, nx2, ny8),
            spec(2, 8, lambda i: (i + 1) * tx2, lambda j: j * ty8 - 1, nx2, ny8),
            spec(2, 8, lambda i: (i + 1) * tx2, lambda j: (j + 1) * ty8, nx2, ny8),
        ]

    out_specs = pl.BlockSpec((q, TX, TY, Zl), lambda i, j: (0, i, j, 0))
    out_shape = jax.ShapeDtypeStruct((q, Xe, Ye, Zl), store_dtype)
    if coalesce_out:
        out_specs = [
            out_specs,
            pl.BlockSpec((q, TX // 2, TY // 2, Zl), lambda i, j: (0, i, j, 0)),
        ]
        out_shape = [out_shape, jax.ShapeDtypeStruct((q, Xe // 2, Ye // 2, Zl), store_dtype)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nX, nY),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + nine(f_spec) + nine(m_spec),
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((q, TX + 4, TY + 4, Zl), compute_dtype),
            pltpu.VMEM((TX + 4, TY + 4, Zl), jnp.int32),
        ]
        + ([pltpu.VMEM((q, TX + 2, TY + 2, Zl), store_dtype)] if pair else []),
    )

    fused = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET + 8 * 2**20),
    )

    def step(f_ext, mask_ext, omega):
        omega_arr = jnp.asarray(omega, dtype=compute_dtype).reshape(1, 1)
        return fused(omega_arr, *([f_ext] * 9), *([mask_ext] * 9))

    return step
