"""2D fused Pallas kernel parity vs the jnp oracle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.conftest import init_env
from xlb_tpu.velocity_set import D2Q9
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.boundary import EquilibriumBC, HalfwayBounceBackBC
from xlb_tpu.kernels.fused_step import build_fused_step


@pytest.mark.fast
def test_fused_2d_matches_reference_step():
    vs = init_env(D2Q9)
    n = 32
    grid = grid_factory((n, n), mesh_shape=(1, 1), devices=jax.devices()[:1])
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)
    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in ("bottom", "left", "right")], axis=1), axis=1)
    bcs = [HalfwayBounceBackBC(indices=walls.tolist()), EquilibriumBC(rho=1.0, u=(0.05, 0.0), indices=box_ne["top"])]
    stepper = IncompressibleNavierStokesStepper(grid, boundary_conditions=bcs)
    f0, f1, bm, mm = stepper.prepare_fields()

    fused = build_fused_step(stepper, tile=(8,), interpret=True)

    fa, fb = f0, f1
    ga, gb = f0, f1
    for t in range(4):
        fa, fb = stepper(fa, fb, bm, mm, 1.6, t)
        fa, fb = fb, fa
        ga, gb = fused(ga, gb, bm, mm, 1.6, t)
        ga, gb = gb, ga
    assert float(jnp.abs(fa - ga).max()) < 5e-6


def test_fused_2d_kbc_matches_reference_step():
    vs = init_env(D2Q9)
    n = 32
    grid = grid_factory((n, n), mesh_shape=(1, 1), devices=jax.devices()[:1])
    box_ne = grid.bounding_box_indices(remove_edges=True)
    box = grid.bounding_box_indices()
    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in ("bottom", "left", "right")], axis=1), axis=1)
    bcs = [HalfwayBounceBackBC(indices=walls.tolist()), EquilibriumBC(rho=1.0, u=(0.05, 0.0), indices=box_ne["top"])]
    stepper = IncompressibleNavierStokesStepper(grid, boundary_conditions=bcs, collision_type="KBC")
    f0, f1, bm, mm = stepper.prepare_fields()
    fused = build_fused_step(stepper, tile=(8,), interpret=True)
    fa, fb = f0, f1
    ga, gb = f0, f1
    for t in range(3):
        fa, fb = stepper(fa, fb, bm, mm, 1.6, t)
        fa, fb = fb, fa
        ga, gb = fused(ga, gb, bm, mm, 1.6, t)
        ga, gb = gb, ga
    assert float(jnp.abs(fa - ga).max()) < 5e-6




@pytest.mark.parametrize("steps", [2, 4, 8])
@pytest.mark.parametrize("store", [jnp.float32, jnp.bfloat16])
def test_fused_2d_kstep_matches_k_single_steps(steps, store):
    """2D temporal blocking: k sweeps per HBM pass equal k single-step
    passes to store-dtype roundoff (same oracle discipline as the 3D
    k-step test: tight ulp bound + high exact-match fraction)."""
    from xlb_tpu.kernels.fused_step import bc_to_spec, pack_masks
    from xlb_tpu.kernels.collide_stream_2d import (
        build_fused_collide_stream_2d,
        build_fused_collide_stream_2d_kstep,
    )

    vs = init_env(D2Q9)
    n = 32
    grid = grid_factory((n, n), mesh_shape=(1, 1), devices=jax.devices()[:1])
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)
    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in ("bottom", "left", "right")], axis=1), axis=1)
    bcs = [HalfwayBounceBackBC(indices=walls.tolist()), EquilibriumBC(rho=1.0, u=(0.05, 0.0), indices=box_ne["top"])]
    stepper = IncompressibleNavierStokesStepper(grid, boundary_conditions=bcs)
    f0, f1, bm, mm = stepper.prepare_fields()
    vset = stepper.velocity_set
    specs = [bc_to_spec(bc, vset) for bc in stepper.boundary_conditions]
    shifted = store == jnp.bfloat16
    kw = dict(collision="BGK", bc_specs=specs, compute_dtype=jnp.float32,
              store_dtype=store, tile_x=8, interpret=True, shifted=shifted)
    one = build_fused_collide_stream_2d(vset, (n, n), **kw)
    kfn = build_fused_collide_stream_2d_kstep(vset, (n, n), steps=steps, **kw)

    mask_i32 = pack_masks(bm, mm)
    rng = np.random.default_rng(11)
    w = vset._w.reshape(vset.q, 1, 1)
    base = (0.02 * rng.standard_normal((vset.q, n, n)) * w).astype(np.float32)
    g = jnp.asarray(base if shifted else base + w, dtype=store)

    g_ref = g
    for _ in range(steps):
        g_ref = one(g_ref, mask_i32, 1.6)
    g_k = kfn(g, mask_i32, 1.6)
    a = np.asarray(g_ref.astype(jnp.float32))
    b = np.asarray(g_k.astype(jnp.float32))
    eps = float(jnp.finfo(store).eps)
    np.testing.assert_allclose(b, a, rtol=8 * eps, atol=8 * eps * 0.05)
    assert np.mean(a == b) > 0.9
