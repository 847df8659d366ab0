"""Parity: the 2-step fused kernel equals two single-step fused passes.

The intermediate sweep is cast to the storage dtype, so equality is exact
(bitwise), not approximate -- the single-step DMA kernel is the oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import init_env
from xlb_tpu.velocity_set import D3Q19, D3Q27
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.boundary import (
    EquilibriumBC,
    FullwayBounceBackBC,
    HalfwayBounceBackBC,
    ExtrapolationOutflowBC,
)
from xlb_tpu.kernels.fused_step import bc_to_spec, pack_masks
from xlb_tpu.kernels.collide_stream_dma import build_fused_collide_stream_3d_dma
from xlb_tpu.kernels.collide_stream_2step import build_fused_collide_stream_3d_2step


def _cavity_stepper(vs_cls, shape, collision="BGK", outflow=False):
    init_env(vs_cls)
    grid = grid_factory(shape, mesh_shape=(1, 1, 1), devices=jax.devices()[:1])
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)
    face_names = ["bottom", "left", "right"] if outflow else ["bottom", "left", "right", "back"]
    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in face_names], axis=1), axis=1)
    bcs = [
        FullwayBounceBackBC(indices=walls.tolist()),
        EquilibriumBC(rho=1.0, u=(0.04, 0.02, 0.0), indices=box_ne["top"]),
        HalfwayBounceBackBC(indices=box_ne["front"]),
    ]
    if outflow:
        bcs.append(ExtrapolationOutflowBC(indices=box_ne["back"]))
    stepper = IncompressibleNavierStokesStepper(grid, boundary_conditions=bcs, collision_type=collision)
    return stepper, stepper.prepare_fields()


@pytest.mark.parametrize("collision", ["BGK", "KBC"])
@pytest.mark.parametrize("outflow", [False, True])
def test_2step_matches_two_single_steps(collision, outflow):
    vs_cls = D3Q27 if collision == "KBC" else D3Q19
    shape = (16, 16, 128)
    stepper, (f_0, f_1, bc_mask, missing_mask) = _cavity_stepper(vs_cls, shape, collision, outflow)
    vs = stepper.velocity_set
    specs = [bc_to_spec(bc, vs) for bc in stepper.boundary_conditions]
    kw = dict(
        collision=collision,
        bc_specs=specs,
        compute_dtype=jnp.float32,
        store_dtype=jnp.bfloat16,
        tile=(8, 8),
        interpret=True,
        shifted=True,
    )
    one = build_fused_collide_stream_3d_dma(vs, shape, **kw)
    two = build_fused_collide_stream_3d_2step(vs, shape, **kw)

    mask_i32 = pack_masks(bc_mask, missing_mask)
    rng = np.random.default_rng(3)
    w = vs._w.reshape(vs.q, 1, 1, 1)
    g = jnp.asarray(
        (0.02 * rng.standard_normal((vs.q,) + shape) * w).astype(np.float32), dtype=jnp.bfloat16
    )  # deviation-form populations

    g_ref = one(one(g, mask_i32, 1.7), mask_i32, 1.7)
    g_two = two(g, mask_i32, 1.7)
    a = np.asarray(g_ref.astype(jnp.float32))
    b = np.asarray(g_two.astype(jnp.float32))
    np.testing.assert_array_equal(a, b)


def test_2step_single_tile_wrap():
    """Domain equal to one tile: every halo piece wraps onto the tile itself."""
    stepper, (f_0, f_1, bc_mask, missing_mask) = _cavity_stepper(D3Q19, (8, 8, 128))
    vs = stepper.velocity_set
    specs = [bc_to_spec(bc, vs) for bc in stepper.boundary_conditions]
    kw = dict(
        collision="BGK", bc_specs=specs, compute_dtype=jnp.float32,
        store_dtype=jnp.float32, tile=(8, 8), interpret=True, shifted=False,
    )
    one = build_fused_collide_stream_3d_dma(vs, (8, 8, 128), **kw)
    two = build_fused_collide_stream_3d_2step(vs, (8, 8, 128), **kw)
    mask_i32 = pack_masks(bc_mask, missing_mask)
    g_ref = one(one(f_0, mask_i32, 1.2), mask_i32, 1.2)
    g_two = two(f_0, mask_i32, 1.2)
    np.testing.assert_array_equal(np.asarray(g_ref), np.asarray(g_two))
