"""Multi-chip fused-kernel path: shard_map + ICI halo exchange matches the
single-device jnp oracle (8 virtual CPU devices, interpret-mode Pallas)."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.conftest import init_env
from xlb_tpu.velocity_set import D3Q19
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.boundary import EquilibriumBC, FullwayBounceBackBC
from xlb_tpu.parallel.pallas_distribute import build_distributed_fused_step


def _scene(grid):
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)
    walls = np.unique(
        np.concatenate([np.asarray(box[k]) for k in ("bottom", "left", "right", "front", "back")], axis=1), axis=1
    )
    return [
        FullwayBounceBackBC(indices=walls.tolist()),
        EquilibriumBC(rho=1.0, u=(0.03, 0.0, 0.0), indices=box_ne["top"]),
    ]


def test_distributed_fused_step_matches_oracle():
    vs = init_env(D3Q19)
    shape = (32, 16, 16)

    # single-device oracle
    grid1 = grid_factory(shape, mesh_shape=(1, 1, 1), devices=jax.devices()[:1])
    st1 = IncompressibleNavierStokesStepper(grid1, boundary_conditions=_scene(grid1))
    f0, f1, bm, mm = st1.prepare_fields()
    fa, fb = f0, f1
    for t in range(3):
        fa, fb = st1(fa, fb, bm, mm, 1.4, t)
        fa, fb = fb, fa
    expected = np.asarray(fa)

    # 8-way sharded fused path
    from xlb_tpu.boundary.registry import boundary_condition_registry

    boundary_condition_registry.reset()
    grid8 = grid_factory(shape)  # 8 devices on x
    st8 = IncompressibleNavierStokesStepper(grid8, boundary_conditions=_scene(grid8))
    g0, g1, bm8, mm8 = st8.prepare_fields()
    step = build_distributed_fused_step(st8, grid8, tile=(4, 8), interpret=True)
    ga, gb = g0, g1
    for t in range(3):
        ga, gb = step(ga, gb, bm8, mm8, 1.4, t)
        ga, gb = gb, ga
    np.testing.assert_allclose(np.asarray(ga), expected, rtol=1e-5, atol=1e-6)
