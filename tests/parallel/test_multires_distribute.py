"""Fused multires tier on a device mesh: the shard_map kernel islands
(parallel/multires_distribute.py) must reproduce the single-device jnp
tier.  The reference runs multires multi-GPU only through the Neon C++
runtime (nse_multires_stepper.py:540-1110 + mGrid halos); here the same
capability is GSPMD level-coupling + ppermute halo exchange around
shard-local CTS kernels."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tests.conftest import init_env
from xlb_tpu.velocity_set import D3Q19
from xlb_tpu.grid import grid_factory
from xlb_tpu.grid.multires import MultiresGrid
from xlb_tpu.models.multires import MultiresIncompressibleNavierStokesStepper
from xlb_tpu.geometry import sphere_triangles
from xlb_tpu.boundary import EquilibriumBC, FullwayBounceBackBC, HalfwayBounceBackBC
from xlb_tpu.boundary.registry import boundary_condition_registry
from xlb_tpu.mres_perf_optimization_type import MresPerfOptimizationType


def _scene():
    grid = MultiresGrid((16, 16, 16), boxes=[((4, 4, 4), (8, 8, 8))])
    helper = grid_factory((16, 16, 16), mesh_shape=(1, 1, 1), devices=jax.devices()[:1])
    box = helper.bounding_box_indices()
    box_ne = helper.bounding_box_indices(remove_edges=True)
    walls = np.unique(
        np.concatenate([np.asarray(box[k]) for k in ("bottom", "left", "right", "front", "back")], axis=1), axis=1
    )
    tris = sphere_triangles(center=(8.0, 8.0, 8.0), radius=2.0, subdivisions=2)
    bcs = {
        0: [HalfwayBounceBackBC(mesh_vertices=tris)],
        1: [
            FullwayBounceBackBC(indices=walls.tolist()),
            EquilibriumBC(rho=1.0, u=(0.03, 0.0, 0.0), indices=box_ne["top"]),
        ],
    }
    return grid, bcs


def _shard_levels(mesh, arrs, lead=None):
    spec = P(lead, "x", "y", None)
    return [jax.device_put(a, NamedSharding(mesh, spec)) for a in arrs]


# not fast-marked: interpret-mode pair kernels under shard_map cost ~1 min
# per case; the smoke tier keeps single-chip multires coverage instead
@pytest.mark.parametrize("mesh_shape", [(2, 2), (4, 2)])
def test_distributed_fused_multires_matches_naive(mesh_shape):
    init_env(D3Q19)
    grid, bcs = _scene()
    naive = MultiresIncompressibleNavierStokesStepper(grid, boundary_conditions=bcs)
    fs, _, bms, mms = naive.prepare_fields()

    px, py = mesh_shape
    mesh = Mesh(np.array(jax.devices()[: px * py]).reshape(px, py), ("x", "y"))
    boundary_condition_registry.reset()
    grid2, bcs2 = _scene()
    dist = MultiresIncompressibleNavierStokesStepper(
        grid2,
        boundary_conditions=bcs2,
        mres_perf_opt=MresPerfOptimizationType.FUSION_AT_FINEST,
        mesh=mesh,
    )
    assert dist._cts is not None, "mesh mode did not build the sharded finest pair kernel"
    assert "shard_map" in dist.active_finest_tier
    assert dist._cts_coarse is not None and "shard_map" in dist.active_coarsest_tier
    fs2, _, bms2, mms2 = dist.prepare_fields()
    fs2 = _shard_levels(mesh, fs2)
    bms2 = _shard_levels(mesh, bms2)
    mms2 = _shard_levels(mesh, mms2)

    a, b = list(fs), list(fs2)
    for _ in range(2):
        a = naive(a, bms, mms, 1.5)
        b = dist(b, bms2, mms2, 1.5)
    for lvl, (la, lb) in enumerate(zip(a, b)):
        diff = float(jnp.abs(la.astype(jnp.float32) - lb.astype(jnp.float32)).max())
        # shard-boundary halo recompute may contract FMAs differently from
        # the single-device slabs: roundoff-scale, not bitwise
        assert diff < 5e-6, f"distributed fused multires diverges from naive at level {lvl}: {diff}"


def test_distributed_fused_multires_three_levels_matches_naive():
    """Deeper hierarchies distribute every fused tier: the sharded mid-level
    single-sub-step kernel and the sharded coarsest pass compose with the
    finest pair across shard cuts."""
    init_env(D3Q19)

    def scene():
        grid = MultiresGrid(
            (24, 24, 24),
            boxes=[((6, 6, 6), (12, 12, 12)), ((6, 6, 6), (12, 12, 12))],
        )
        helper = grid_factory((24, 24, 24), mesh_shape=(1, 1, 1), devices=jax.devices()[:1])
        box = helper.bounding_box_indices()
        box_ne = helper.bounding_box_indices(remove_edges=True)
        walls = np.unique(
            np.concatenate([np.asarray(box[k]) for k in ("bottom", "left", "right", "front", "back")], axis=1),
            axis=1,
        )
        bcs = {
            2: [
                FullwayBounceBackBC(indices=walls.tolist()),
                EquilibriumBC(rho=1.0, u=(0.03, 0.0, 0.0), indices=box_ne["top"]),
            ]
        }
        return grid, bcs

    grid, bcs = scene()
    naive = MultiresIncompressibleNavierStokesStepper(grid, boundary_conditions=bcs)
    fs, _, bms, mms = naive.prepare_fields()
    a = list(fs)
    for _ in range(2):
        a = naive(a, bms, mms, 1.5)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("x", "y"))
    boundary_condition_registry.reset()
    grid2, bcs2 = scene()
    dist = MultiresIncompressibleNavierStokesStepper(
        grid2,
        boundary_conditions=bcs2,
        mres_perf_opt=MresPerfOptimizationType.FUSION_AT_FINEST,
        mesh=mesh,
    )
    assert dist._cts is not None and dist._cts_coarse is not None
    assert dist._cts_mid[1] is not None, "the BC-less middle level should take the sharded fused path"
    fs2, _, bms2, mms2 = dist.prepare_fields()
    fs2 = _shard_levels(mesh, fs2)
    bms2 = _shard_levels(mesh, bms2)
    mms2 = _shard_levels(mesh, mms2)
    b = list(fs2)
    for _ in range(2):
        b = dist(b, bms2, mms2, 1.5)
    for lvl, (la, lb) in enumerate(zip(a, b)):
        diff = float(jnp.abs(la.astype(jnp.float32) - lb.astype(jnp.float32)).max())
        assert diff < 5e-6, f"3-level distributed fused diverges from naive at level {lvl}: {diff}"


@pytest.mark.parametrize("precision,tol", [("FP32FP32", 5e-6), ("FP32BF16", 6e-3)])
def test_distributed_fused_multires_window_matches_naive(precision, tol):
    """The resident-ring window path (one dispatch per N coarse steps)
    composes with the shard_map kernel islands; 16-bit storage keeps the
    whole window in deviation form across the islands and tracks the f32
    jnp tier to the bf16 deviation scale."""
    init_env(D3Q19)
    grid, bcs = _scene()
    naive = MultiresIncompressibleNavierStokesStepper(grid, boundary_conditions=bcs)
    fs, _, bms, mms = naive.prepare_fields()
    a = list(fs)
    for _ in range(2):
        a = naive(a, bms, mms, 1.5)

    boundary_condition_registry.reset()
    init_env(D3Q19, precision=precision)
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("x", "y"))
    grid2, bcs2 = _scene()
    dist = MultiresIncompressibleNavierStokesStepper(
        grid2,
        boundary_conditions=bcs2,
        mres_perf_opt=MresPerfOptimizationType.FUSION_AT_FINEST,
        mesh=mesh,
    )
    assert dist._cts_shifted == (precision == "FP32BF16")
    fs2, _, bms2, mms2 = dist.prepare_fields()
    fs2 = _shard_levels(mesh, fs2)
    bms2 = _shard_levels(mesh, bms2)
    mms2 = _shard_levels(mesh, mms2)
    win = dist.build_window(2, donate=False)
    b = win(list(fs2), bms2, mms2, 1.5)
    for lvl, (la, lb) in enumerate(zip(a, b)):
        diff = float(jnp.abs(la.astype(jnp.float32) - lb.astype(jnp.float32)).max())
        assert diff < tol, f"distributed multires window diverges from naive at level {lvl}: {diff}"
