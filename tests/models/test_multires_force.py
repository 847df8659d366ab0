"""MultiresMomentumTransfer: drag on a refined-grid sphere matches the
single-resolution wind tunnel at matched (fine-level) resolution.

Reference capability: force/multires_momentum_transfer.py:17-139 with the
multires windtunnel example as the use case.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tests.conftest import init_env
from xlb_tpu.velocity_set import D3Q19
from xlb_tpu.grid import grid_factory
from xlb_tpu.grid.multires import MultiresGrid
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.helper.simulation_manager import MultiresSimulationManager
from xlb_tpu.geometry import sphere_triangles
from xlb_tpu.boundary import EquilibriumBC, ExtrapolationOutflowBC, HalfwayBounceBackBC
from xlb_tpu.ops import MomentumTransfer, MultiresMomentumTransfer

U_IN = 0.04
OMEGA = 1.3
STEPS_FINE = 120  # single-res steps == 2 x coarse steps


def _walls_inlet_outlet(helper_grid):
    # periodic lateral boundaries: a no-slip tunnel wall sits half a cell
    # differently at each resolution, which would shift the effective
    # cross-section between the two runs and confound the comparison
    box = helper_grid.bounding_box_indices()
    return [
        EquilibriumBC(rho=1.0, u=(U_IN, 0.0, 0.0), indices=box["left"]),
        ExtrapolationOutflowBC(indices=box["right"]),
    ]


def _single_res_drag():
    grid = grid_factory((48, 24, 24), mesh_shape=(1, 1, 1), devices=jax.devices()[:1])
    tris = sphere_triangles(center=(12.0, 12.0, 12.0), radius=3.0, subdivisions=3)
    bc_object = HalfwayBounceBackBC(mesh_vertices=tris)
    stepper = IncompressibleNavierStokesStepper(grid, boundary_conditions=_walls_inlet_outlet(grid) + [bc_object])
    f0, f1, bm, mm = stepper.prepare_fields()
    mt = MomentumTransfer(bc_object)
    window = stepper.build_multi_step(2, donate=False)
    drags = []
    fa, fb = f0, f1
    for t in range(STEPS_FINE // 2):
        fa, fb = window(fa, fb, bm, mm, OMEGA, 2 * t)
        drags.append(float(mt(fa, fb, bm, mm)[0]))
    return np.asarray(drags)


def _multires_drag():
    from xlb_tpu.boundary.registry import boundary_condition_registry

    boundary_condition_registry.reset()
    # coarse (24,12,12): fine box [1,11)^3 -> fine level (20,20,20);
    # sphere center (6,6,6) radius 1.5 coarse = (12,12,12)/r3 in fine-
    # equivalent units, matching the single-res scene exactly.
    grid = MultiresGrid((24, 12, 12), boxes=[((1, 1, 1), (10, 10, 10))])
    helper = grid_factory((24, 12, 12), mesh_shape=(1, 1, 1), devices=jax.devices()[:1])
    tris = sphere_triangles(center=(6.0, 6.0, 6.0), radius=1.5, subdivisions=3)
    bc_object = HalfwayBounceBackBC(mesh_vertices=tris)
    bcs = {0: [bc_object], grid.num_levels - 1: _walls_inlet_outlet(helper)}
    sim = MultiresSimulationManager(grid, omega_finest=OMEGA, boundary_conditions=bcs)
    mt = MultiresMomentumTransfer(bc_object, level=0)
    drags = []
    for _ in range(STEPS_FINE // 2):
        drags.append(float(np.asarray(sim.step_with_force(mt))[0]))
    return np.asarray(drags)


def test_multires_drag_matches_single_res():
    vs = init_env(D3Q19)
    d_single = _single_res_drag()
    d_multi = _multires_drag()
    assert np.isfinite(d_single).all() and np.isfinite(d_multi).all()
    # compare the late-time mean (both in fine-level lattice units)
    s = d_single[-15:].mean()
    m = d_multi[-15:].mean()
    assert s > 0 and m > 0, f"drag should be positive (got single={s}, multi={m})"
    assert abs(m - s) / s < 0.1, f"multires drag {m:.4e} deviates from single-res {s:.4e} by {abs(m - s) / s:.1%}"
