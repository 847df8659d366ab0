"""Fused 2D collide-stream Pallas kernel.

Layout (q, X, Y): X on sublanes, Y on lanes.  Tiles span full Y so y pulls
are lane rolls (periodic); x halos arrive as 8-row sublane-aligned neighbor
blocks (Mosaic forbids 1-row sublane strips) of which only the adjacent row
is used -- read amplification 1 + 16/TX.

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
):
    X, Y = shape
    TX = tile_x
    q = velocity_set.q
    assert X % TX == 0, f"tile_x {TX} must divide X {X}"
    assert TX % 8 == 0, "tile_x must be a multiple of the sublane tile (8)"
    nX = X // TX
    r = TX // 8
    nX8 = X // 8

    body = _build_kernel_body(velocity_set, collision, list(bc_specs), compute_dtype, store_dtype, TX, None, shifted=shifted, has_solids=has_solids, force_vector=force_vector)
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nX,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((q, TX, Y), lambda i: (0, i, 0)),
            pl.BlockSpec((q, 8, Y), lambda i: (0, jax.lax.rem(i * r - 1 + nX8, nX8), 0)),
            pl.BlockSpec((q, 8, Y), lambda i: (0, jax.lax.rem((i + 1) * r, nX8), 0)),
            pl.BlockSpec((TX, Y), lambda i: (i, 0)),
        ]
        + ([pl.BlockSpec((velocity_set.d, TX, Y), lambda i: (0, i, 0))] if use_aux else []),
        out_specs=pl.BlockSpec((q, TX, Y), lambda i: (0, i, 0)),
        scratch_shapes=[pltpu.VMEM((q, TX + 2, Y), compute_dtype)],
    )

    fused = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((q, X, Y), store_dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    def step(f, mask_i32, omega, aux=None):
        omega_arr = jnp.asarray(omega, dtype=compute_dtype).reshape(1, 1)
        if use_aux:
            assert aux is not None, "spatial-BC kernel needs the aux prescribed-velocity field"
            return fused(omega_arr, f, f, f, mask_i32, aux)
        return fused(omega_arr, f, f, f, mask_i32)

    return step
