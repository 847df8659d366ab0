"""Parity: the 2-step fused kernel equals two single-step fused passes.

The intermediate sweep is cast to the storage dtype, so the two paths run
the same arithmetic -- but XLA's FMA contraction depends on the slab shape
(the 2-step sweeps run on TX+2-extent regions vs the oracle's TX), so
isolated elements can round differently by ~1 ulp of the store dtype.  The
assertions therefore use a tight ulp-scale bound plus a high exact-match
fraction (a real indexing bug on these white-noise fields shows O(100%)
errors), the same discrimination the k-step test documents.
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
from xlb_tpu.kernels.collide_stream_2step import (
    build_fused_collide_stream_3d_2step,
    build_fused_collide_stream_3d_kstep,
)


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
    eps = float(jnp.finfo(jnp.bfloat16).eps)
    np.testing.assert_allclose(b, a, rtol=8 * eps, atol=8 * eps * 0.05)
    assert np.mean(a == b) > 0.99, f"only {np.mean(a == b):.4f} of elements match exactly"


@pytest.mark.parametrize("steps", [3, 4])
@pytest.mark.parametrize("store", [jnp.bfloat16, jnp.float32])
def test_kstep_matches_k_single_steps(steps, store):
    """Deeper temporal blocking: k fused sweeps per HBM pass equal k
    single-step passes to store-dtype roundoff.

    Not bitwise: XLA's FMA contraction depends on the slab shape, and the
    k-step sweeps run on (TX+2(k-s))-extent regions vs the oracle's TX --
    isolated elements can round differently by ~1 ulp of the store dtype.
    A real indexing bug on this white-noise field would show O(100%)
    errors, so a tight ulp-scale relative bound plus a high exact-match
    fraction still discriminates sharply."""
    shape = (16, 16, 128)
    stepper, (f_0, f_1, bc_mask, missing_mask) = _cavity_stepper(D3Q19, shape, "BGK", outflow=True)
    vs = stepper.velocity_set
    specs = [bc_to_spec(bc, vs) for bc in stepper.boundary_conditions]
    shifted = store == jnp.bfloat16
    kw = dict(
        collision="BGK", bc_specs=specs, compute_dtype=jnp.float32,
        store_dtype=store, tile=(8, 8), interpret=True, shifted=shifted,
    )
    one = build_fused_collide_stream_3d_dma(vs, shape, **kw)
    kfn = build_fused_collide_stream_3d_kstep(vs, shape, steps=steps, **kw)

    mask_i32 = pack_masks(bc_mask, missing_mask)
    rng = np.random.default_rng(7)
    w = vs._w.reshape(vs.q, 1, 1, 1)
    base = 0.02 * rng.standard_normal((vs.q,) + shape).astype(np.float32) * w
    g = jnp.asarray(base if shifted else base + w, dtype=store)

    g_ref = g
    for _ in range(steps):
        g_ref = one(g_ref, mask_i32, 1.7)
    g_k = kfn(g, mask_i32, 1.7)
    a = np.asarray(g_ref.astype(jnp.float32))
    b = np.asarray(g_k.astype(jnp.float32))
    eps = float(jnp.finfo(store).eps)
    np.testing.assert_allclose(b, a, rtol=8 * eps, atol=8 * eps * 0.05)
    # ulp-level FMA-contraction noise touches ~10% of elements at k=4 f32
    # (the pair-shared feq reassociation widened this from a few %); a real
    # indexing bug would fail the allclose above AND drop this to ~0
    assert np.mean(a == b) > 0.85, f"only {np.mean(a == b):.4f} of elements match exactly"


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
    a, b = np.asarray(g_ref), np.asarray(g_two)
    eps = float(jnp.finfo(jnp.float32).eps)
    np.testing.assert_allclose(b, a, rtol=8 * eps, atol=8 * eps * 0.05)
    assert np.mean(a == b) > 0.99, f"only {np.mean(a == b):.4f} of elements match exactly"
