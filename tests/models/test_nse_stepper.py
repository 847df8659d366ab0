"""End-to-end stepper tests: conservation, cavity physics, Taylor-Green decay.

These are the acceptance checks of SURVEY.md §4 (d): physics tests that the
reference delegates to examples.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import init_env
from xlb_tpu.velocity_set import D2Q9, D3Q19
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.boundary import FullwayBounceBackBC, HalfwayBounceBackBC, EquilibriumBC
from xlb_tpu.ops import Macroscopic


def _build_cavity(grid_shape=(32, 32), u_lid=0.05):
    grid = grid_factory(grid_shape)
    box = grid.bounding_box_indices()
    box_no_edge = grid.bounding_box_indices(remove_edges=True)

    lid = box_no_edge["top"]
    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in ("bottom", "left", "right")], axis=1), axis=1)
    # remove lid voxels from the wall set (corners belong to walls)
    bc_top = EquilibriumBC(rho=1.0, u=(u_lid, 0.0), indices=lid)
    bc_walls = HalfwayBounceBackBC(indices=walls.tolist())
    stepper = IncompressibleNavierStokesStepper(grid, boundary_conditions=[bc_walls, bc_top])
    return grid, stepper


@pytest.mark.fast
def test_periodic_step_conserves_mass_momentum():
    """With no BCs (fully periodic), one BGK step conserves rho and momentum."""
    vs = init_env(D3Q19)
    grid = grid_factory((8, 8, 8))
    stepper = IncompressibleNavierStokesStepper(grid)
    f_0, f_1, bc_mask, missing_mask = stepper.prepare_fields()

    rng = np.random.default_rng(0)
    f_0 = jnp.asarray(0.05 + 0.01 * rng.random((vs.q, 8, 8, 8), dtype=np.float32))
    mac = Macroscopic()
    rho0, u0 = mac(f_0)
    mom0 = float(jnp.sum(rho0 * u0[0])), float(jnp.sum(rho0 * u0[1]))

    f_0_out, f_1_out = stepper(f_0, f_1, bc_mask, missing_mask, 1.0, 0)
    rho1, u1 = mac(f_1_out)
    assert np.isclose(float(jnp.sum(rho1)), float(jnp.sum(rho0)), rtol=1e-6)
    mom1 = float(jnp.sum(rho1 * u1[0])), float(jnp.sum(rho1 * u1[1]))
    np.testing.assert_allclose(mom1, mom0, atol=1e-4)


def test_lid_driven_cavity_2d_runs_and_is_physical():
    vs = init_env(D2Q9)
    u_lid = 0.05
    grid, stepper = _build_cavity((32, 32), u_lid)
    f_0, f_1, bc_mask, missing_mask = stepper.prepare_fields()

    omega = 1.6
    for t in range(300):
        f_0, f_1 = stepper(f_0, f_1, bc_mask, missing_mask, omega, t)
        f_0, f_1 = f_1, f_0

    rho, u = Macroscopic()(f_0.astype(jnp.float32))
    u_np = np.asarray(u)
    assert np.isfinite(u_np).all()
    # near-lid fluid moves with the lid, bottom fluid almost still
    assert u_np[0, 16, -2] > 0.01
    assert abs(u_np[0, 16, 1]) < 0.01
    # a vortex forms: somewhere the x-velocity is negative (return flow)
    assert u_np[0].min() < -1e-4
    # mass stays near 1
    assert abs(float(np.asarray(rho).mean()) - 1.0) < 1e-2


def test_taylor_green_vortex_decay_2d():
    """Ma->0 Taylor-Green: kinetic energy decays as exp(-2 nu k^2 t) with
    nu = cs^2 (tau - 1/2).  Accept a few-percent error at this resolution."""
    vs = init_env(D2Q9)
    n = 64
    grid = grid_factory((n, n))
    stepper = IncompressibleNavierStokesStepper(grid)
    f_0, f_1, bc_mask, missing_mask = stepper.prepare_fields()

    # initial condition
    u0 = 0.01
    x = (np.arange(n) + 0.5) / n * 2 * np.pi
    X, Y = np.meshgrid(x, x, indexing="ij")
    ux = u0 * np.cos(X) * np.sin(Y)
    uy = -u0 * np.sin(X) * np.cos(Y)
    u = jnp.asarray(np.stack([ux, uy]), dtype=jnp.float32)
    rho = jnp.ones((1, n, n), dtype=jnp.float32)
    from xlb_tpu.ops.equilibrium import quadratic_equilibrium

    f_0 = quadratic_equilibrium(rho, u, vs._c, vs._w, jnp.float32)

    omega = 1.25
    tau = 1.0 / omega
    nu = (tau - 0.5) / 3.0
    k2 = 2 * (2 * np.pi / n) ** 2

    ke0 = float(jnp.sum(u**2))
    steps = 200
    for t in range(steps):
        f_0, f_1 = stepper(f_0, f_1, bc_mask, missing_mask, omega, t)
        f_0, f_1 = f_1, f_0
    _, u_t = Macroscopic()(f_0)
    ke = float(jnp.sum(u_t**2))
    expected = ke0 * np.exp(-2 * nu * k2 * steps)
    assert abs(ke / expected - 1.0) < 0.03, f"KE decay {ke:.4e} vs analytic {expected:.4e}"


@pytest.mark.fast
def test_jitted_multi_step_matches_python_loop():
    vs = init_env(D2Q9)
    grid, stepper = _build_cavity((16, 16))
    f_0, f_1, bc_mask, missing_mask = stepper.prepare_fields()

    fa, fb = f_0, f_1
    for t in range(10):
        fa, fb = stepper(fa, fb, bc_mask, missing_mask, 1.3, t)
        fa, fb = fb, fa

    run = stepper.build_multi_step(10, donate=False)
    ga, gb = run(f_0, f_1, bc_mask, missing_mask, 1.3)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(fa), rtol=2e-6, atol=1e-7)
