"""Fused collide-only Pallas kernel (the multires performance tier).

The multires stepper's per-level collide (moments -> equilibrium ->
collision -> collision-step BCs -> forcing) is purely elementwise, but the
jnp tier pays ~q HBM passes for it: XLA's loop fusion re-reads every input
channel per output channel because the moments couple all q populations.
This kernel reads each cell's q populations into VMEM once and writes q
outputs once -- one HBM round trip for the whole collide phase.

Cells are flattened to (q, N) and padded to a lane-aligned tile multiple,
so it applies to ANY level box shape (multires levels are arbitrary even
cuboids); streaming stays in XLA (per-channel rolls are single-pass).

TPU counterpart of the reference's multires fused kernels
(nse_multires_stepper.py:583-1110): the NAIVE/FUSION strategies of
MresPerfOptimizationType select between the jnp tier and this kernel; the
SFV variants (Neon sparse-voxel fast paths) are subsumed -- the dense
design has no sparse-voxel bookkeeping to skip.

Only elementwise epilogues are supported: collision-step BCs (fullway
bounce-back), exact-difference forcing, and the solid keep-out.  Levels
with aux-staging BCs (extrapolation outflow) fall back to the jnp tier.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xlb_tpu.kernels.collide_stream import _build_kernel_body, kernel_bc_id, kernel_solid_id, unpack_bc_id

TILE = 8 * 512  # (sublane, lane) = (8, 512) per channel once reshaped


def collide_specs(bc_specs):
    """The subset of BC specs the collide-only kernel handles; raises if a
    spec needs non-elementwise treatment at collision time."""
    out = []
    for spec in bc_specs:
        if spec["kind"] == "extrapolation_outflow":
            raise NotImplementedError("aux-staging BCs need neighbor reads; use the jnp tier for this level")
        if spec["step"] == "collision":
            out.append(spec)
    return out


def build_fused_collide(
    velocity_set,
    n_cells,
    collision="BGK",
    bc_specs=(),
    compute_dtype=jnp.float32,
    store_dtype=jnp.float32,
    interpret=False,
    force_vector=None,
    has_solids=True,
):
    """Build ``collide(f2d, mask2d, omega) -> f2d`` over (q, Npad) arrays
    (Npad a TILE multiple; padding cells must carry rest-state values)."""
    vs = velocity_set
    q, d = vs.q, vs.d
    opp = vs._opp_indices
    cdt = compute_dtype
    specs = collide_specs(list(bc_specs))

    body = _build_kernel_body(vs, collision, [], compute_dtype, store_dtype, None, None, force_vector=None)
    moments, equilibrium, collide = body.moments, body.equilibrium, body.collide

    Npad = n_cells
    assert Npad % TILE == 0, f"padded cell count {Npad} must be a multiple of {TILE}"
    n_tiles = Npad // TILE

    def kernel(omega_ref, f_ref, mask_ref, out):
        omega = cdt(omega_ref[0, 0])
        f_s = [f_ref[l].astype(cdt) for l in range(q)]
        packed = mask_ref[0]
        bc = unpack_bc_id(packed, q)

        rho, u = moments(f_s)
        feq = equilibrium(rho, u)
        f_out = collide(f_s, feq, omega)

        if force_vector is not None:
            u_f = [u[a] + cdt(force_vector[a]) for a in range(d)]
            feq_f = equilibrium(rho, u_f)
            f_out = [f_out[l] + (feq_f[l] - feq[l]) for l in range(q)]

        for spec in specs:
            on = bc == kernel_bc_id(spec["id"], q)
            if spec["kind"] == "fullway":
                f_out = [jnp.where(on, f_s[opp[l]], f_out[l]) for l in range(q)]
            else:
                raise NotImplementedError(f"BC kind {spec['kind']!r} in the fused collide kernel")

        solid = (bc == kernel_solid_id(q)) if has_solids else None
        for l in range(q):
            result = jnp.where(solid, f_s[l], f_out[l]) if has_solids else f_out[l]
            out[l] = result.astype(store_dtype)

    spec_f = pl.BlockSpec((q, TILE), lambda i: (0, i))
    spec_mask = pl.BlockSpec((1, TILE), lambda i: (0, i))
    fused = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec_f, spec_mask],
            out_specs=spec_f,
        ),
        out_shape=jax.ShapeDtypeStruct((q, Npad), store_dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    def run(f2d, mask2d, omega):
        omega_arr = jnp.asarray(omega, dtype=compute_dtype).reshape(1, 1)
        return fused(omega_arr, f2d, mask2d)

    return run


def build_level_collide(velocity_set, shape, **kw):
    """Wrap build_fused_collide for an (q, *shape) level array: flattens,
    pads to the tile multiple with rest-state cells, and restores shape.
    Returns ``collide(f, mask_i32, omega) -> f_post_collision`` in the
    compute dtype."""
    vs = velocity_set
    q = vs.q
    n = int(np.prod(shape))
    npad = -(-n // TILE) * TILE
    fused = build_fused_collide(velocity_set, npad, **kw)
    w_pad = vs._w.astype(np.float64)

    def run(f, mask_i32, omega):
        f2d = f.reshape(q, n)
        if npad != n:
            # rest-state padding keeps moments finite in the dead lanes
            pad = jnp.broadcast_to(jnp.asarray(w_pad, dtype=f2d.dtype)[:, None], (q, npad - n))
            f2d = jnp.concatenate([f2d, pad], axis=1)
            m2d = jnp.concatenate([mask_i32.reshape(1, n), jnp.zeros((1, npad - n), jnp.int32)], axis=1)
        else:
            m2d = mask_i32.reshape(1, n)
        out = fused(f2d, m2d, omega)
        return out[:, :n].reshape((q,) + tuple(shape))

    return run
