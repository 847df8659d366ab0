"""Multi-resolution stepper tests.

Physics checks for the dense explode/coalesce scheme:
- a uniform equilibrium flow through a refined patch stays exactly uniform,
- total mass is conserved across coarse steps,
- a Taylor-Green vortex on a two-level grid decays at the same analytic
  rate as single-resolution (the refined patch must not distort the field).
"""

import numpy as np
import jax.numpy as jnp

from tests.conftest import init_env
from xlb_tpu.velocity_set import D2Q9
from xlb_tpu.grid.multires import MultiresGrid
from xlb_tpu.helper.simulation_manager import MultiresSimulationManager
from xlb_tpu.models.multires import compute_omega
from xlb_tpu.ops import Macroscopic
from xlb_tpu.ops.equilibrium import quadratic_equilibrium
import pytest



@pytest.mark.fast
def test_compute_omega_matches_reference_formula():
    # omega_L = 2^(L+1) w0 / ((2^L - 1) w0 + 2); level 0 (finest) identity
    assert np.isclose(compute_omega(1.6, 0), 1.6)
    w1 = compute_omega(1.6, 1)
    assert np.isclose(w1, 4 * 1.6 / (1.6 + 2.0))
    # coarser level => larger tau (smaller omega... actually acoustic scaling
    # gives nu_lattice halved per coarser level => omega closer to 2? verify
    # monotonicity against tau relation instead: nu_L = (1/w_L - .5)/3 must
    # halve per coarser level
    nu0 = (1 / 1.6 - 0.5) / 3
    nu1 = (1 / w1 - 0.5) / 3
    assert np.isclose(nu1, nu0 / 2)


def test_uniform_flow_invariant_through_refinement():
    vs = init_env(D2Q9)
    grid = MultiresGrid((32, 32), boxes=[((8, 8), (8, 8))])
    assert grid.num_levels == 2
    assert grid.levels[0].shape == (16, 16)

    u0 = np.zeros((2,), dtype=np.float64)
    u0[0] = 0.02

    def initializer(fs):
        out = []
        for f in fs:
            shape = f.shape[1:]
            rho = jnp.ones((1,) + shape, dtype=jnp.float32)
            u = jnp.broadcast_to(jnp.asarray(u0, dtype=jnp.float32).reshape(2, 1, 1), (2,) + shape)
            out.append(quadratic_equilibrium(rho, u, vs._c, vs._w, jnp.float32).astype(f.dtype))
        return out

    sim = MultiresSimulationManager(grid, omega_finest=1.3, initializer=initializer)
    sim.run(5)
    for level, (rho, u) in enumerate(sim.export_macroscopic()):
        np.testing.assert_allclose(rho, 1.0, atol=1e-5, err_msg=f"level {level} rho")
        np.testing.assert_allclose(u[0], 0.02, atol=1e-5, err_msg=f"level {level} ux")
        np.testing.assert_allclose(u[1], 0.0, atol=1e-5, err_msg=f"level {level} uy")


@pytest.mark.fast
def test_mass_conservation_two_levels():
    vs = init_env(D2Q9)
    grid = MultiresGrid((24, 24), boxes=[((6, 6), (8, 8))])

    rng = np.random.default_rng(0)

    def initializer(fs):
        out = []
        for f in fs:
            shape = f.shape[1:]
            rho = jnp.asarray(1.0 + 0.02 * rng.random((1,) + shape), dtype=jnp.float32)
            u = jnp.asarray(0.01 * rng.standard_normal((2,) + shape), dtype=jnp.float32)
            out.append(quadratic_equilibrium(rho, u, vs._c, vs._w, jnp.float32).astype(f.dtype))
        return out

    sim = MultiresSimulationManager(grid, omega_finest=1.5, initializer=initializer)

    def active_mass():
        # coarse mass over non-refined cells + fine mass (in coarse units:
        # each fine cell is (1/2)^d of a coarse cell)
        (rho_f, _), (rho_c, _) = sim.export_macroscopic()
        box = grid.levels[0]
        o, e = box.origin_in_parent, box.extent_in_parent
        mask = np.ones_like(rho_c[0], dtype=bool)
        mask[o[0] : o[0] + e[0], o[1] : o[1] + e[1]] = False
        return rho_c[0][mask].sum() + rho_f[0].sum() / 4.0

    m0 = active_mass()
    sim.run(10)
    m1 = active_mass()
    assert abs(m1 / m0 - 1.0) < 2e-3, f"mass drift {m1 / m0 - 1.0:.2e}"


@pytest.mark.fast
def test_taylor_green_two_level_decay():
    vs = init_env(D2Q9)
    n = 64
    grid = MultiresGrid((n // 2, n // 2), boxes=[((8, 8), (16, 16))])
    omega = 1.3

    # initialize both levels by sampling the analytic field at cell centers
    u0mag = 0.005

    def analytic_u(shape, scale, origin):
        # cell centers in coarse units -> radians over the coarse domain
        coords = [
            (np.arange(s) + 0.5) * scale + o for s, o in zip(shape, origin)
        ]
        X, Y = np.meshgrid(*coords, indexing="ij")
        fx = 2 * np.pi / (n // 2)
        ux = u0mag * np.cos(fx * X) * np.sin(fx * Y)
        uy = -u0mag * np.sin(fx * X) * np.cos(fx * Y)
        return np.stack([ux, uy]).astype(np.float32)

    def initializer(fs):
        out = []
        for lvl_idx, f in enumerate(fs):
            shape = f.shape[1:]
            if lvl_idx == 0:
                u = analytic_u(shape, 0.5, grid.levels[0].origin_in_parent)
            else:
                u = analytic_u(shape, 1.0, (0, 0))
            rho = jnp.ones((1,) + shape, dtype=jnp.float32)
            out.append(quadratic_equilibrium(rho, jnp.asarray(u), vs._c, vs._w, jnp.float32).astype(f.dtype))
        return out

    sim = MultiresSimulationManager(grid, omega_finest=omega, initializer=initializer)
    steps = 60  # coarse steps
    sim.run(steps)
    (rho_f, u_f), (rho_c, u_c) = sim.export_macroscopic()

    # coarse-level omega is compute_omega(omega, 1); viscous decay measured on
    # the coarse field outside the box
    nu_coarse = (1.0 / compute_omega(omega, 1) - 0.5) / 3.0
    k2 = 2 * (2 * np.pi / (n // 2)) ** 2
    expected_factor = np.exp(-2 * nu_coarse * k2 * steps)

    box = grid.levels[0]
    o, e = box.origin_in_parent, box.extent_in_parent
    mask = np.ones_like(rho_c[0], dtype=bool)
    mask[o[0] : o[0] + e[0], o[1] : o[1] + e[1]] = False
    u_init = analytic_u((n // 2, n // 2), 1.0, (0, 0))
    ke0 = (u_init[:, mask] ** 2).sum()
    ke = (u_c[:, mask] ** 2).sum()
    measured = ke / ke0
    assert abs(measured / expected_factor - 1.0) < 0.1, f"decay {measured:.4f} vs {expected_factor:.4f}"
    # refined field must stay finite and smooth
    assert np.isfinite(u_f).all()
    assert np.abs(u_f).max() < 2 * u0mag
