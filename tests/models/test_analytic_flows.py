"""Analytic-solution acceptance tests: Poiseuille and Couette flows.

These validate the exact-difference body force and the moving-wall
bounce-back quantitatively against closed-form steady profiles (the
physics-validation role the reference delegates to its paper benchmarks).

Wall-position conventions measured for this implementation (fp64, steady):
- fullway bounce-back on shell rows puts the wall exactly AT those nodes
  (H_eff = ny - 2 between the two wall rows, exact at tau = 1);
- halfway bounce-back carries the standard BGK tau-dependent slip, so the
  Couette test asserts linearity + shear rate rather than absolute wall
  position.
"""

import numpy as np

from tests.conftest import init_env
from xlb_tpu.velocity_set import D2Q9
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.boundary import FullwayBounceBackBC, HalfwayBounceBackBC
from xlb_tpu.ops import Macroscopic
from xlb_tpu.utils import viscosity_from_omega


def _wall_indices(grid, faces):
    box = grid.bounding_box_indices()
    return np.unique(np.concatenate([np.asarray(box[k]) for k in faces], axis=1), axis=1)


def test_poiseuille_profile_matches_analytic():
    """Force-driven channel with fullway walls: steady
    u_x(y) = (F / 2 nu) (y - 1)(ny - 1 - y), exact at omega = 1."""
    vs = init_env(D2Q9, precision="FP64FP64")
    nx, ny = 4, 16
    grid = grid_factory((nx, ny), mesh_shape=(1, 1), devices=__import__("jax").devices()[:1])
    force = 1e-6
    omega = 1.0
    nu = viscosity_from_omega(omega)

    walls = _wall_indices(grid, ("bottom", "top"))
    stepper = IncompressibleNavierStokesStepper(
        grid,
        boundary_conditions=[FullwayBounceBackBC(indices=walls.tolist())],
        force_vector=np.array([force, 0.0]),
    )
    f0, f1, bm, mm = stepper.prepare_fields()
    run = stepper.build_multi_step(60000, donate=False)
    f0, f1 = run(f0, f1, bm, mm, omega)

    _, u = Macroscopic()(f0)
    profile = np.asarray(u)[0, nx // 2, 1:-1]  # fluid rows between the walls
    y = np.arange(1, ny - 1).astype(np.float64)
    # fullway BB places the walls half a link inside of the wall rows:
    # no-slip planes at y = 0.5 and y = ny - 1.5, H = ny - 2 (measured
    # H_eff = 14.00 exactly at omega = 1 for ny = 16)
    analytic = force / (2 * nu) * (y - 0.5) * ((ny - 1.5) - y)
    np.testing.assert_allclose(profile, analytic, rtol=0.01, atol=1e-6)


def test_couette_profile_is_linear_with_correct_shear():
    """Moving top wall (halfway BB): steady profile is linear; the shear
    rate matches U / H_eff within the BGK slip tolerance."""
    vs = init_env(D2Q9, precision="FP64FP64")
    nx, ny = 4, 16
    grid = grid_factory((nx, ny), mesh_shape=(1, 1), devices=__import__("jax").devices()[:1])
    u_wall = 0.02
    omega = 1.0

    bottom = _wall_indices(grid, ("bottom",))
    top = _wall_indices(grid, ("top",))
    stepper = IncompressibleNavierStokesStepper(
        grid,
        boundary_conditions=[
            HalfwayBounceBackBC(indices=bottom.tolist()),
            HalfwayBounceBackBC(indices=top.tolist(), prescribed_value=(u_wall, 0.0)),
        ],
    )
    f0, f1, bm, mm = stepper.prepare_fields()
    run = stepper.build_multi_step(60000, donate=False)
    f0, f1 = run(f0, f1, bm, mm, omega)

    _, u = Macroscopic()(f0)
    full = np.asarray(u)[0, nx // 2, :]
    # exclude the BC rows and their immediate neighbors (Knudsen layer)
    profile = full[2:-2]
    y = np.arange(2, ny - 2).astype(np.float64)

    # linearity: residual of a linear fit is tiny in the bulk
    coef = np.polyfit(y, profile, 1)
    residual = profile - np.polyval(coef, y)
    assert np.abs(residual).max() < 1e-3 * u_wall, f"profile not linear: {residual}"

    # shear rate ~ u_wall / H with H in [ny - 2, ny + 1] (slip tolerance)
    shear = coef[0]
    assert u_wall / (ny + 1) < shear < u_wall / (ny - 2), f"shear {shear:.3e} out of range"
    # monotone increasing toward the moving wall
    assert full[-2] > full[1] >= -1e-4 * u_wall
