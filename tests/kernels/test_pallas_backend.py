"""ComputeBackend.PALLAS end-to-end: the stepper transparently routes
through the fused kernel and matches the JAX tier."""

import numpy as np
import jax
import jax.numpy as jnp

import xlb_tpu as xlb
from tests.conftest import init_env
from xlb_tpu.velocity_set import D3Q19
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.boundary import EquilibriumBC, FullwayBounceBackBC


def _scene(grid):
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)
    walls = np.unique(
        np.concatenate([np.asarray(box[k]) for k in ("bottom", "left", "right", "front", "back")], axis=1), axis=1
    )
    return [FullwayBounceBackBC(indices=walls.tolist()), EquilibriumBC(rho=1.0, u=(0.03, 0.0, 0.0), indices=box_ne["top"])]


def test_pallas_backend_stepper_matches_jax_tier():
    vs = init_env(D3Q19)
    grid = grid_factory((16, 16, 16), mesh_shape=(1, 1, 1), devices=jax.devices()[:1])
    st_jax = IncompressibleNavierStokesStepper(grid, boundary_conditions=_scene(grid))
    f0, f1, bm, mm = st_jax.prepare_fields()
    fa, fb = f0, f1
    for t in range(3):
        fa, fb = st_jax(fa, fb, bm, mm, 1.5, t)
        fa, fb = fb, fa

    from xlb_tpu.default_config import DefaultConfig
    from xlb_tpu.boundary.registry import boundary_condition_registry

    DefaultConfig.reset()
    boundary_condition_registry.reset()
    vs2 = init_env(D3Q19, backend=xlb.ComputeBackend.PALLAS)
    grid2 = grid_factory((16, 16, 16), mesh_shape=(1, 1, 1), devices=jax.devices()[:1])
    st_pallas = IncompressibleNavierStokesStepper(grid2, boundary_conditions=_scene(grid2))
    assert st_pallas._pallas_step is not None
    g0, g1, bm2, mm2 = st_pallas.prepare_fields()
    ga, gb = g0, g1
    for t in range(3):
        ga, gb = st_pallas(ga, gb, bm2, mm2, 1.5, t)
        ga, gb = gb, ga
    np.testing.assert_allclose(np.asarray(ga), np.asarray(fa), rtol=1e-6, atol=1e-7)


def test_pallas_backend_multi_step_window():
    """build_multi_step under ComputeBackend.PALLAS routes through the fused
    window and matches the JAX tier."""
    vs = init_env(D3Q19)
    grid = grid_factory((16, 16, 16), mesh_shape=(1, 1, 1), devices=jax.devices()[:1])
    st_jax = IncompressibleNavierStokesStepper(grid, boundary_conditions=_scene(grid))
    f0, f1, bm, mm = st_jax.prepare_fields()
    run_jax = st_jax.build_multi_step(4, donate=False)
    fa, _ = run_jax(f0, f1, bm, mm, 1.5)

    from xlb_tpu.default_config import DefaultConfig
    from xlb_tpu.boundary.registry import boundary_condition_registry

    DefaultConfig.reset()
    boundary_condition_registry.reset()
    init_env(D3Q19, backend=xlb.ComputeBackend.PALLAS)
    grid2 = grid_factory((16, 16, 16), mesh_shape=(1, 1, 1), devices=jax.devices()[:1])
    st_p = IncompressibleNavierStokesStepper(grid2, boundary_conditions=_scene(grid2))
    g0, g1, bm2, mm2 = st_p.prepare_fields()
    run_p = st_p.build_multi_step(4, donate=False)
    ga, _ = run_p(g0, g1, bm2, mm2, 1.5)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(fa), rtol=1e-5, atol=1e-6)
