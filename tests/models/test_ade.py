"""Advection-diffusion stepper physics tests: analytic diffusion rate,
advection transport, Dirichlet steady state, conservation, and the
Boussinesq-coupled buoyancy direction."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.conftest import init_env
from xlb_tpu.velocity_set import D2Q9
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import (
    IncompressibleNavierStokesStepper,
    AdvectionDiffusionStepper,
    ThermalNSEStepper,
    omega_from_diffusivity,
    diffusivity_from_omega,
)
from xlb_tpu.boundary import EquilibriumBC, HalfwayBounceBackBC
from xlb_tpu.boundary.registry import boundary_condition_registry
import pytest


def _grid(n):
    return grid_factory((n, n), mesh_shape=(1, 1), devices=jax.devices()[:1])


def _gaussian_phi(n, sigma, offset=1.0):
    x = np.arange(n) - n / 2
    xx, yy = np.meshgrid(x, x, indexing="ij")
    return (offset + np.exp(-(xx**2 + yy**2) / (2 * sigma**2))).astype(np.float32)


def _run(stepper, g0, g1, bm, mm, omega_phi, u, steps):
    @jax.jit
    def window(g0, g1):
        def body(t, carry):
            a, b = carry
            a, b = stepper(a, b, bm, mm, omega_phi, u, t)
            return (b, a)

        return jax.lax.fori_loop(0, steps, body, (g0, g1))

    a, _ = window(g0, g1)
    return a


@pytest.mark.fast
def test_omega_diffusivity_roundtrip():
    for D in (0.02, 0.1, 1.0 / 6.0):
        assert abs(diffusivity_from_omega(omega_from_diffusivity(D)) - D) < 1e-12


def test_pure_diffusion_matches_analytic_variance():
    """u = 0: a Gaussian spreads with sigma^2(t) = sigma0^2 + 2 D t."""
    vs = init_env(D2Q9)
    n, sigma0, D, steps = 64, 4.0, 0.1, 100
    stepper = AdvectionDiffusionStepper(_grid(n))
    phi0 = _gaussian_phi(n, sigma0, offset=0.0)  # zero background: clean moments
    g0, g1, bm, mm = stepper.prepare_fields(phi_init=phi0)
    u = jnp.zeros((2, n, n), dtype=jnp.float32)
    a = _run(stepper, g0, g1, bm, mm, omega_from_diffusivity(D), u, steps)
    phi = np.asarray(stepper.phi(a))[0]

    # conservation
    np.testing.assert_allclose(phi.sum(), phi0.sum(), rtol=1e-5)
    # measured variance along x
    x = np.arange(n) - n / 2
    mass = phi.sum()
    mean_x = (phi.sum(axis=1) * x).sum() / mass
    var_x = (phi.sum(axis=1) * (x - mean_x) ** 2).sum() / mass
    expected = sigma0**2 + 2 * D * steps
    assert abs(var_x - expected) / expected < 0.02, (var_x, expected)


def test_advection_moves_center_of_mass():
    vs = init_env(D2Q9)
    n, steps, ux = 64, 100, 0.05
    stepper = AdvectionDiffusionStepper(_grid(n))
    phi0 = _gaussian_phi(n, 4.0, offset=0.0)
    g0, g1, bm, mm = stepper.prepare_fields(phi_init=phi0)
    u = jnp.zeros((2, n, n), dtype=jnp.float32).at[0].set(ux)
    a = _run(stepper, g0, g1, bm, mm, omega_from_diffusivity(0.05), u, steps)
    phi = np.asarray(stepper.phi(a))[0]

    x = np.arange(n)
    com = (phi.sum(axis=1) * x).sum() / phi.sum()
    expected = n / 2 + ux * steps
    assert abs(com - expected) < 0.15, (com, expected)


def test_dirichlet_steady_state_linear_profile():
    """Hot wall (phi=1) and cold wall (phi=0) bracket a linear profile."""
    vs = init_env(D2Q9)
    n = 16
    grid = _grid(n)
    box = grid.bounding_box_indices()
    hot = EquilibriumBC(rho=1.0, u=(0.0, 0.0), indices=box["left"])
    cold = EquilibriumBC(rho=0.0, u=(0.0, 0.0), indices=box["right"])
    stepper = AdvectionDiffusionStepper(grid, boundary_conditions=[hot, cold])
    g0, g1, bm, mm = stepper.prepare_fields(phi_init=0.5 * np.ones((n, n), np.float32))
    u = jnp.zeros((2, n, n), dtype=jnp.float32)
    a = _run(stepper, g0, g1, bm, mm, omega_from_diffusivity(0.2), u, 4000)
    phi = np.asarray(stepper.phi(a))[0]
    profile = phi.mean(axis=1)
    # endpoints pinned, interior linear
    assert abs(profile[0] - 1.0) < 5e-3 and abs(profile[-1]) < 5e-3
    lin = np.linspace(profile[0], profile[-1], n)
    assert np.abs(profile - lin).max() < 0.01


def test_adiabatic_walls_conserve_scalar():
    vs = init_env(D2Q9)
    n = 32
    grid = _grid(n)
    box = grid.bounding_box_indices()
    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in box], axis=1), axis=1)
    stepper = AdvectionDiffusionStepper(grid, boundary_conditions=[HalfwayBounceBackBC(indices=walls.tolist())])
    phi0 = _gaussian_phi(n, 3.0, offset=0.2)
    g0, g1, bm, mm = stepper.prepare_fields(phi_init=phi0)
    u = jnp.zeros((2, n, n), dtype=jnp.float32)
    a = _run(stepper, g0, g1, bm, mm, 1.2, u, 50)
    phi = np.asarray(stepper.phi(a))[0]
    assert np.isfinite(phi).all()
    # bounce-back walls reflect every population: total scalar conserved
    assert abs(phi.sum() - phi0.sum()) / phi0.sum() < 1e-4


def test_boussinesq_hot_blob_rises():
    """A hot blob under gravity (0, -1) gets a positive vertical velocity."""
    vs = init_env(D2Q9)
    n = 32
    boundary_condition_registry.reset()
    nse = IncompressibleNavierStokesStepper(_grid(n))
    ade = AdvectionDiffusionStepper(_grid(n))
    thermal = ThermalNSEStepper(nse, ade, beta=5e-3, gravity=(0.0, -1.0), phi_ref=0.0)

    f0, f1, bcf, mf = nse.prepare_fields()
    phi0 = _gaussian_phi(n, 3.0, offset=0.0)
    g0, g1, bcg, mg = ade.prepare_fields(phi_init=phi0)

    run = thermal.build_multi_step(100)
    f0, f1, g0, g1 = run(f0, f1, g0, g1, bcf, mf, bcg, mg, 1.2, 1.2)
    from xlb_tpu.ops import Macroscopic

    rho, u = Macroscopic()(f0)
    uy_center = float(u[1, n // 2, n // 2])
    assert np.isfinite(np.asarray(u)).all()
    assert uy_center > 1e-5, f"hot blob should rise, uy={uy_center}"
    # scalar advected upward with the plume: center of mass moves +y
    phi = np.asarray(ade.phi(g0))[0]
    y = np.arange(n)
    com_y = (phi.sum(axis=0) * y).sum() / phi.sum()
    assert com_y > n / 2 - 0.05


@pytest.mark.fast
def test_fused_ade_matches_jnp_tier():
    """The PALLAS-tier ADE step (interpret on CPU) matches the jnp tier to
    f32 roundoff, with a spatially varying advecting velocity and Dirichlet
    + bounce-back boundaries."""
    import xlb_tpu as xlb

    vs = init_env(D2Q9)
    n = 32
    grid = _grid(n)
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)
    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in ("bottom", "top")], axis=1), axis=1)
    bcs = lambda: [
        EquilibriumBC(rho=1.0, u=(0.0, 0.0), indices=box_ne["left"]),
        HalfwayBounceBackBC(indices=walls.tolist()),
    ]
    ref = AdvectionDiffusionStepper(grid, boundary_conditions=bcs())
    g0, g1, bm, mm = ref.prepare_fields(phi_init=_gaussian_phi(n, 4.0))
    rng = np.random.default_rng(2)
    u = jnp.asarray(0.03 * rng.standard_normal((2, n, n)).astype(np.float32))

    boundary_condition_registry.reset()
    fused = AdvectionDiffusionStepper(grid, boundary_conditions=bcs(), compute_backend=xlb.ComputeBackend.PALLAS)
    fa, fb = g0, g1
    ga, gb = g0, g1
    for t in range(3):
        fa, fb = ref(fa, fb, bm, mm, 1.3, u, t)
        fa, fb = fb, fa
        ga, gb = fused(ga, gb, bm, mm, 1.3, u, t)
        ga, gb = gb, ga
    assert float(jnp.abs(fa - ga).max()) < 5e-6


def test_fused_ade_3d_matches_jnp_tier():
    """3D fused ADE (manual-DMA kernel, z=128 lanes) parity."""
    import xlb_tpu as xlb
    from xlb_tpu.velocity_set import D3Q19

    vs = init_env(D3Q19)
    shape = (16, 16, 128)
    grid = grid_factory(shape, mesh_shape=(1, 1, 1), devices=jax.devices()[:1])
    ref = AdvectionDiffusionStepper(grid)
    phi0 = np.zeros(shape, np.float32)
    phi0[6:10, 6:10, 60:68] = 1.0
    g0, g1, bm, mm = ref.prepare_fields(phi_init=phi0)
    rng = np.random.default_rng(5)
    u = jnp.asarray(0.02 * rng.standard_normal((3,) + shape).astype(np.float32))

    boundary_condition_registry.reset()
    fused = AdvectionDiffusionStepper(grid, compute_backend=xlb.ComputeBackend.PALLAS)
    fa, fb = g0, g1
    ga, gb = g0, g1
    for t in range(2):
        fa, fb = ref(fa, fb, bm, mm, 1.4, u, t)
        fa, fb = fb, fa
        ga, gb = fused(ga, gb, bm, mm, 1.4, u, t)
        ga, gb = gb, ga
    assert float(jnp.abs(fa - ga).max()) < 5e-6


def test_fused_thermal_matches_jnp_tier():
    """PALLAS-backed thermal coupling (per-voxel buoyancy via the fused
    forced step, interpret on CPU) matches the jnp tier to f32 roundoff."""
    import xlb_tpu as xlb

    vs = init_env(D2Q9)
    n = 32
    phi0 = _gaussian_phi(n, 3.0, offset=0.0)

    def build(backend):
        boundary_condition_registry.reset()
        nse = IncompressibleNavierStokesStepper(_grid(n), compute_backend=backend)
        ade = AdvectionDiffusionStepper(_grid(n), compute_backend=backend)
        th = ThermalNSEStepper(nse, ade, beta=5e-3, gravity=(0.0, -1.0))
        f0, f1, bcf, mf = nse.prepare_fields()
        g0, g1, bcg, mg = ade.prepare_fields(phi_init=phi0)
        return th, (f0, f1, g0, g1, bcf, mf, bcg, mg)

    ref, (f0, f1, g0, g1, bcf, mf, bcg, mg) = build(None)
    ra = (f0, f1, g0, g1)
    for t in range(3):
        a, b, c, d = ref(*ra, bcf, mf, bcg, mg, 1.3, 1.3, t)
        ra = (b, a, d, c)

    fus, (f0, f1, g0, g1, bcf, mf, bcg, mg) = build(__import__("xlb_tpu").ComputeBackend.PALLAS)
    rb = (f0, f1, g0, g1)
    for t in range(3):
        a, b, c, d = fus(*rb, bcf, mf, bcg, mg, 1.3, 1.3, t)
        rb = (b, a, d, c)

    assert float(jnp.abs(ra[0] - rb[0]).max()) < 5e-6  # populations f
    assert float(jnp.abs(ra[2] - rb[2]).max()) < 5e-6  # scalar g


def test_fused_ade_zouhe_dirichlet_and_curved_obstacle():
    """Fused ADE with a ZouHe 'pressure' wall (Dirichlet on the transported
    scalar: the rho closure IS phi) plus a curved halfway-bounce-back
    obstacle matches the jnp tier (VERDICT r2 #8: fused-ADE BC-kind limits
    lifted one notch)."""
    import xlb_tpu as xlb
    from xlb_tpu.boundary import ZouHeBC

    vs = init_env(D2Q9)
    n = 32
    grid = _grid(n)
    box_ne = grid.bounding_box_indices(remove_edges=True)
    # voxelized circle obstacle (adiabatic: pure reflection conserves phi)
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="xy")
    circ = (xx - n / 2) ** 2 + (yy - n / 2) ** 2 <= 5.0**2
    circ_idx = np.stack(np.nonzero(circ))
    bcs = lambda: [
        ZouHeBC("pressure", prescribed_value=1.5, indices=box_ne["left"]),
        HalfwayBounceBackBC(indices=circ_idx.tolist()),
    ]
    ref = AdvectionDiffusionStepper(grid, boundary_conditions=bcs())
    g0, g1, bm, mm = ref.prepare_fields(phi_init=_gaussian_phi(n, 4.0))
    rng = np.random.default_rng(7)
    u = jnp.asarray(0.02 * rng.standard_normal((2, n, n)).astype(np.float32))

    boundary_condition_registry.reset()
    fused = AdvectionDiffusionStepper(grid, boundary_conditions=bcs(), compute_backend=xlb.ComputeBackend.PALLAS)
    assert fused._pallas_step is not None
    fa, fb = g0, g1
    ga, gb = g0, g1
    for t in range(3):
        fa, fb = ref(fa, fb, bm, mm, 1.3, u, t)
        fa, fb = fb, fa
        ga, gb = fused(ga, gb, bm, mm, 1.3, u, t)
        ga, gb = gb, ga
    assert float(jnp.abs(fa - ga).max()) < 5e-6
