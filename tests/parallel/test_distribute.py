"""Distribution tests on the 8-device virtual CPU mesh.

Checks both distribution modes against a single-device run:
- GSPMD: jnp-tier stepper jitted over sharded fields (XLA inserts the
  collectives for the rolls),
- explicit shard_map + ppermute halo exchange (distribute()).
"""

import numpy as np
import jax
import jax.numpy as jnp

from tests.conftest import init_env
from xlb_tpu.velocity_set import D2Q9, D3Q19
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.boundary import EquilibriumBC, HalfwayBounceBackBC
from xlb_tpu.ops.stream import Stream
from xlb_tpu.parallel import distribute, distribute_operator
import pytest

pytestmark = pytest.mark.fast  # whole-module smoke tier (sub-5-min suite)


def _single_device_reference(vs, n_steps=5, shape=(32, 32)):
    grid1 = grid_factory(shape, mesh_shape=(1,) * len(shape), devices=jax.devices()[:1])
    box = grid1.bounding_box_indices()
    box_ne = grid1.bounding_box_indices(remove_edges=True)
    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in ("bottom", "left", "right")], axis=1), axis=1)
    bcs = [HalfwayBounceBackBC(indices=walls.tolist()), EquilibriumBC(rho=1.0, u=(0.05, 0.0), indices=box_ne["top"])]
    stepper = IncompressibleNavierStokesStepper(grid1, boundary_conditions=bcs)
    f0, f1, bm, mm = stepper.prepare_fields()
    for t in range(n_steps):
        f0, f1 = stepper(f0, f1, bm, mm, 1.5, t)
        f0, f1 = f1, f0
    return np.asarray(f0)


def test_gspmd_sharded_step_matches_single_device():
    vs = init_env(D2Q9)
    ref = _single_device_reference(vs)

    from xlb_tpu.boundary.registry import boundary_condition_registry

    boundary_condition_registry.reset()
    grid = grid_factory((32, 32))  # sharded over 8 devices on x
    assert grid.nDevices == 8
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)
    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in ("bottom", "left", "right")], axis=1), axis=1)
    bcs = [HalfwayBounceBackBC(indices=walls.tolist()), EquilibriumBC(rho=1.0, u=(0.05, 0.0), indices=box_ne["top"])]
    stepper = IncompressibleNavierStokesStepper(grid, boundary_conditions=bcs)
    f0, f1, bm, mm = stepper.prepare_fields()
    step = stepper.build_jitted_step(donate=False)
    for t in range(5):
        f0, f1 = step(f0, f1, bm, mm, 1.5, t)
    np.testing.assert_allclose(np.asarray(f0), ref, rtol=1e-5, atol=1e-7)


def test_distributed_stream_matches_global_roll():
    """The explicit shard_map halo exchange reproduces the global pull-stream."""
    vs = init_env(D3Q19)
    grid = grid_factory((16, 8, 8))
    stream = Stream()
    dist_stream = distribute_operator(stream, grid, vs)

    rng = np.random.default_rng(0)
    f = rng.random((vs.q, 16, 8, 8), dtype=np.float32)
    expected = np.asarray(stream(jnp.asarray(f)))
    got = np.asarray(dist_stream(grid.with_sharding(jnp.asarray(f))))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_distribute_stepper_with_post_streaming_bcs():
    """distribute() on a stepper with streaming BCs distributes only Stream
    (reference distribute.py:88-101) and still matches single-device."""
    vs = init_env(D2Q9)
    ref = _single_device_reference(vs)

    from xlb_tpu.boundary.registry import boundary_condition_registry

    boundary_condition_registry.reset()
    grid = grid_factory((32, 32))
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)
    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in ("bottom", "left", "right")], axis=1), axis=1)
    bcs = [HalfwayBounceBackBC(indices=walls.tolist()), EquilibriumBC(rho=1.0, u=(0.05, 0.0), indices=box_ne["top"])]
    stepper = IncompressibleNavierStokesStepper(grid, boundary_conditions=bcs)
    f0, f1, bm, mm = stepper.prepare_fields()
    stepper = distribute(stepper, grid, vs)
    for t in range(5):
        f0, f1 = stepper(f0, f1, bm, mm, 1.5, t)
        f0, f1 = f1, f0
    np.testing.assert_allclose(np.asarray(f0), ref, rtol=1e-5, atol=1e-7)


def test_distribute_2axis_mesh_matches_single_device():
    """Sequential per-axis halo patching is exact on a 2-D (4, 2) shard mesh,
    including diagonal populations crossing shard corners (data reaches the
    corner in two hops: the x-patch forwards the diagonal shard's value to
    the y-neighbor, whose y-patch forwards it on)."""
    vs = init_env(D2Q9)
    ref = _single_device_reference(vs)

    from xlb_tpu.boundary.registry import boundary_condition_registry

    boundary_condition_registry.reset()
    grid = grid_factory((32, 32), mesh_shape=(4, 2))
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)
    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in ("bottom", "left", "right")], axis=1), axis=1)
    bcs = [HalfwayBounceBackBC(indices=walls.tolist()), EquilibriumBC(rho=1.0, u=(0.05, 0.0), indices=box_ne["top"])]
    stepper = IncompressibleNavierStokesStepper(grid, boundary_conditions=bcs)
    f0, f1, bm, mm = stepper.prepare_fields()
    stepper = distribute(stepper, grid, vs)
    for t in range(5):
        f0, f1 = stepper(f0, f1, bm, mm, 1.5, t)
        f0, f1 = f1, f0
    np.testing.assert_allclose(np.asarray(f0), ref, rtol=1e-5, atol=1e-7)
