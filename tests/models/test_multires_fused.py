"""Multires performance tier: the fused Pallas collide kernel per level
matches the naive jnp tier to f32 roundoff."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import init_env
from xlb_tpu.velocity_set import D3Q19
from xlb_tpu.grid import grid_factory
from xlb_tpu.grid.multires import MultiresGrid
from xlb_tpu.models.multires import MultiresIncompressibleNavierStokesStepper
from xlb_tpu.geometry import sphere_triangles
from xlb_tpu.boundary import EquilibriumBC, FullwayBounceBackBC, HalfwayBounceBackBC
from xlb_tpu.mres_perf_optimization_type import MresPerfOptimizationType


def _scene(collision="BGK"):
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


@pytest.mark.parametrize(
    "collision,strategy",
    [
        pytest.param("BGK", MresPerfOptimizationType.FUSION_AT_FINEST, id="BGK-FUSION_AT_FINEST"),
        pytest.param(
            "BGK",
            MresPerfOptimizationType.FUSION_AT_FINEST_SFV_ALL,
            id="BGK-FUSION_AT_FINEST_SFV_ALL",
            marks=pytest.mark.fast,  # the smoke-tier fused-multires representative
        ),
        pytest.param("KBC", MresPerfOptimizationType.FUSION_AT_FINEST, id="KBC-FUSION_AT_FINEST"),
        pytest.param("KBC", MresPerfOptimizationType.FUSION_AT_FINEST_SFV_ALL, id="KBC-FUSION_AT_FINEST_SFV_ALL"),
    ],
)
def test_fused_multires_matches_naive(strategy, collision):
    from xlb_tpu.velocity_set import D3Q27
    from xlb_tpu.boundary.registry import boundary_condition_registry

    vs_cls = D3Q27 if collision == "KBC" else D3Q19
    init_env(vs_cls)
    grid, bcs = _scene(collision)
    naive = MultiresIncompressibleNavierStokesStepper(grid, boundary_conditions=bcs, collision_type=collision)
    fs, _, bms, mms = naive.prepare_fields()

    boundary_condition_registry.reset()
    grid2, bcs2 = _scene(collision)
    fused = MultiresIncompressibleNavierStokesStepper(
        grid2, boundary_conditions=bcs2, collision_type=collision, mres_perf_opt=strategy
    )
    assert fused._cts is not None, "strategy did not build the fused finest (CTS) kernel"
    if strategy == MresPerfOptimizationType.FUSION_AT_FINEST_SFV_ALL:
        assert any(k is not None for k in fused._fused_collide), "SFV_ALL selected no fused-collide level"
    fs2, _, bms2, mms2 = fused.prepare_fields()

    a, b = list(fs), list(fs2)
    for _ in range(2):
        a = naive(a, bms, mms, 1.5)
        b = fused(b, bms2, mms2, 1.5)
    for la, lb in zip(a, b):
        diff = float(jnp.abs(la.astype(jnp.float32) - lb.astype(jnp.float32)).max())
        assert diff < 5e-6, f"fused multires collide diverges from naive by {diff}"


def test_fused_multires_bf16_shifted_tracks_f32():
    """16-bit multires storage runs the CTS pair kernel in deviation form
    (g = f - w) and every jnp coarse level shifted inside the window; the
    result tracks the f32 tier to the bf16 deviation scale (~0.4% of the
    weights), through BOTH the per-call and resident-window paths."""
    from xlb_tpu.boundary.registry import boundary_condition_registry

    results = {}
    for precision in ("FP32FP32", "FP32BF16"):
        boundary_condition_registry.reset()
        init_env(D3Q19, precision=precision)
        grid, bcs = _scene()
        st = MultiresIncompressibleNavierStokesStepper(
            grid, boundary_conditions=bcs, mres_perf_opt=MresPerfOptimizationType.FUSION_AT_FINEST
        )
        assert st._cts is not None
        assert st._cts_shifted == (precision == "FP32BF16")
        fs, _, bms, mms = st.prepare_fields()
        win = st.build_window(2, donate=False)
        out_w = win(list(fs), bms, mms, 1.5)
        out_c = st(list(fs), bms, mms, 1.5)
        results[precision] = (out_w, out_c)

    for k in range(2):  # 0: window path, 1: per-call path
        for lvl, (la, lb) in enumerate(zip(results["FP32FP32"][k], results["FP32BF16"][k])):
            diff = float(jnp.abs(la.astype(jnp.float32) - lb.astype(jnp.float32)).max())
            assert diff < 6e-3, f"bf16-shifted multires diverges from f32 at level {lvl} (path {k}): {diff}"


def test_fused_multires_falls_back_on_staging_bcs():
    """A level with an aux-staging BC (extrapolation outflow) silently uses
    the jnp tier rather than mis-fusing."""
    from xlb_tpu.boundary import ExtrapolationOutflowBC

    init_env(D3Q19)
    grid = MultiresGrid((16, 16, 16), boxes=[((4, 4, 4), (8, 8, 8))])
    helper = grid_factory((16, 16, 16), mesh_shape=(1, 1, 1), devices=jax.devices()[:1])
    box_ne = helper.bounding_box_indices(remove_edges=True)
    bcs = {1: [ExtrapolationOutflowBC(indices=box_ne["right"])]}
    stepper = MultiresIncompressibleNavierStokesStepper(
        grid, boundary_conditions=bcs, mres_perf_opt=MresPerfOptimizationType.FUSION_AT_FINEST_SFV_ALL
    )
    assert stepper._cts is not None  # finest has no staging BC
    assert stepper._fused_collide[1] is None  # outflow level falls back


@pytest.mark.fast
def test_fused_coarsest_gates_on_bc_inside_refined_region():
    """The fused coarsest pass masks the refined region as cell-type 30,
    which would skip a BC voxel there -- such scenes must fall back to the
    jnp coarse path (with a tier notice) and still match the naive tier."""
    from xlb_tpu.boundary.registry import boundary_condition_registry

    init_env(D3Q19)
    grid, bcs = _scene()
    st = MultiresIncompressibleNavierStokesStepper(
        grid, boundary_conditions=bcs, mres_perf_opt=MresPerfOptimizationType.FUSION_AT_FINEST
    )
    assert st._cts_coarse is not None
    assert st._coarse_bc_placement_ok() is True  # walls/lid are outside the box

    # a coarse BC voxel INSIDE the refined region -> host-side gate trips
    boundary_condition_registry.reset()
    grid2, bcs2 = _scene()
    bcs2[1].append(FullwayBounceBackBC(indices=[[8], [8], [8]]))
    st2 = MultiresIncompressibleNavierStokesStepper(
        grid2, boundary_conditions=bcs2, mres_perf_opt=MresPerfOptimizationType.FUSION_AT_FINEST
    )
    with pytest.warns(RuntimeWarning, match="inside the refined region"):
        assert st2._coarse_bc_placement_ok() is False

    # physics parity of the fallback vs the naive tier
    boundary_condition_registry.reset()
    grid3, bcs3 = _scene()
    bcs3[1].append(FullwayBounceBackBC(indices=[[8], [8], [8]]))
    naive = MultiresIncompressibleNavierStokesStepper(grid3, boundary_conditions=bcs3)
    fs, _, bms, mms = naive.prepare_fields()
    a = naive(list(fs), bms, mms, 1.5)
    fs2, _, bms2, mms2 = st2.prepare_fields()
    b = st2(list(fs2), bms2, mms2, 1.5)
    for la, lb in zip(a, b):
        assert float(jnp.abs(la.astype(jnp.float32) - lb.astype(jnp.float32)).max()) < 5e-6

    # a needs_padding BC (halfway) is TAGGED at its one-hop dilated shell
    # (pad_indices): solid voxels just OUTSIDE the refined box whose shell
    # reaches inside must also trip the gate
    boundary_condition_registry.reset()
    grid4, bcs4 = _scene()
    bcs4[1].append(HalfwayBounceBackBC(indices=[[3], [8], [8]]))  # shell hits x=4 in [4,12)
    st4 = MultiresIncompressibleNavierStokesStepper(
        grid4, boundary_conditions=bcs4, mres_perf_opt=MresPerfOptimizationType.FUSION_AT_FINEST
    )
    with pytest.warns(RuntimeWarning, match="inside the refined region"):
        assert st4._coarse_bc_placement_ok() is False


def test_fused_coarsest_three_levels_matches_naive():
    """Deeper hierarchies fuse the coarsest pass too: the coarsest level's
    collide+coalesce+stream runs in one kernel while the middle level stays
    jnp, and the lazily-collided ghost faces replace the bulk-collide
    explosion gather -- parity vs the naive tier."""
    from xlb_tpu.boundary.registry import boundary_condition_registry

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

    boundary_condition_registry.reset()
    grid2, bcs2 = scene()
    fused = MultiresIncompressibleNavierStokesStepper(
        grid2, boundary_conditions=bcs2, mres_perf_opt=MresPerfOptimizationType.FUSION_AT_FINEST
    )
    assert fused._cts is not None and fused._cts_coarse is not None
    assert fused._cts_mid[1] is not None, "the BC-less middle level should take the fused sub-step path"
    fs2, _, bms2, mms2 = fused.prepare_fields()

    a, b = list(fs), list(fs2)
    for _ in range(2):
        a = naive(a, bms, mms, 1.5)
        b = fused(b, bms2, mms2, 1.5)
    for lvl, (la, lb) in enumerate(zip(a, b)):
        diff = float(jnp.abs(la.astype(jnp.float32) - lb.astype(jnp.float32)).max())
        assert diff < 5e-6, f"3-level fused diverges from naive at level {lvl} by {diff}"

    # the resident-ring window path takes the same fused branches
    win = fused.build_window(2, donate=False)
    c = win(list(fs2), bms2, mms2, 1.5)
    for lvl, (la, lc) in enumerate(zip(a, c)):
        diff = float(jnp.abs(la.astype(jnp.float32) - lc.astype(jnp.float32)).max())
        assert diff < 5e-6, f"3-level fused WINDOW diverges from naive at level {lvl} by {diff}"


def test_fused_four_levels_matches_naive():
    """4-level hierarchy (round-3 VERDICT #6): two stacked fused MIDDLE
    levels between the fused finest pair and the fused coarsest pass --
    the recursion depth the reference's simulation manager supports
    (simulation_manager.py:137-170) -- stays in parity with the naive
    tier, per-call and through the resident-ring window."""
    from xlb_tpu.boundary.registry import boundary_condition_registry

    init_env(D3Q19)

    def scene():
        grid = MultiresGrid(
            (24, 24, 24),
            boxes=[
                ((6, 6, 6), (12, 12, 12)),
                ((6, 6, 6), (12, 12, 12)),
                ((6, 6, 6), (12, 12, 12)),
            ],
        )
        helper = grid_factory((24, 24, 24), mesh_shape=(1, 1, 1), devices=jax.devices()[:1])
        box = helper.bounding_box_indices()
        box_ne = helper.bounding_box_indices(remove_edges=True)
        walls = np.unique(
            np.concatenate([np.asarray(box[k]) for k in ("bottom", "left", "right", "front", "back")], axis=1),
            axis=1,
        )
        bcs = {
            3: [
                FullwayBounceBackBC(indices=walls.tolist()),
                EquilibriumBC(rho=1.0, u=(0.03, 0.0, 0.0), indices=box_ne["top"]),
            ]
        }
        return grid, bcs

    grid, bcs = scene()
    assert grid.num_levels == 4
    naive = MultiresIncompressibleNavierStokesStepper(grid, boundary_conditions=bcs)
    fs, _, bms, mms = naive.prepare_fields()

    boundary_condition_registry.reset()
    grid2, bcs2 = scene()
    fused = MultiresIncompressibleNavierStokesStepper(
        grid2, boundary_conditions=bcs2, mres_perf_opt=MresPerfOptimizationType.FUSION_AT_FINEST
    )
    assert fused._cts is not None and fused._cts_coarse is not None
    assert fused._cts_mid[1] is not None and fused._cts_mid[2] is not None, (
        "both BC-less middle levels should take the fused sub-step path"
    )
    fs2, _, bms2, mms2 = fused.prepare_fields()

    a, b = list(fs), list(fs2)
    for _ in range(2):
        a = naive(a, bms, mms, 1.5)
        b = fused(b, bms2, mms2, 1.5)
    for lvl, (la, lb) in enumerate(zip(a, b)):
        diff = float(jnp.abs(la.astype(jnp.float32) - lb.astype(jnp.float32)).max())
        assert diff < 5e-6, f"4-level fused diverges from naive at level {lvl} by {diff}"

    win = fused.build_window(2, donate=False)
    c = win(list(fs2), bms2, mms2, 1.5)
    for lvl, (la, lc) in enumerate(zip(a, c)):
        diff = float(jnp.abs(la.astype(jnp.float32) - lc.astype(jnp.float32)).max())
        assert diff < 5e-6, f"4-level fused WINDOW diverges from naive at level {lvl} by {diff}"


@pytest.mark.fast
def test_tile_ranking_prefers_coalesce_capable():
    """Regression guard for the 3.7x fully-refined-bf16 slowdown: the
    kernel-tile ranker must place coalesce-capable (tile, ring) candidates
    first, for BOTH precisions and at the production 96^3 shape -- losing
    the in-kernel 2x2 side output costs a separate full-interior average
    pass that dwarfs any halo-traffic delta (docs/performance.md)."""
    from xlb_tpu.boundary.registry import boundary_condition_registry

    for precision in ("FP32FP32", "FP32BF16"):
        boundary_condition_registry.reset()
        init_env(D3Q19, precision=precision)
        n = 96
        grid = MultiresGrid((n, n, n), boxes=[((0, 0, 0), (n, n, n))])
        st = MultiresIncompressibleNavierStokesStepper(
            grid, boundary_conditions={}, mres_perf_opt=MresPerfOptimizationType.FUSION_AT_FINEST
        )
        assert st._cts is not None, precision
        assert st._cts_has_coalesce, (precision, st.active_finest_tier)
