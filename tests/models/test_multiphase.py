"""Shan-Chen multiphase physics tests (beyond-reference family).

Validation targets: spinodal phase separation below the critical point,
mass conservation, a stationary droplet with bounded spurious currents
and a positive Laplace pressure jump, and jnp/PALLAS tier parity (the
force rides the same per-voxel exact-difference channels as the thermal
coupling)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import init_env
from xlb_tpu.velocity_set import D2Q9
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper, ShanChenMultiphaseStepper


def _uniform_init(stepper, rho):
    """Equilibrium populations at rest for a given density field."""
    vs = stepper.velocity_set
    w = np.asarray(vs._w, dtype=np.float32).reshape((-1,) + (1,) * rho.ndim)
    return jnp.asarray(w * np.asarray(rho, np.float32)[None])


def _droplet_rho(n, radius, rho_l=1.9, rho_v=0.16, width=2.0):
    x = np.arange(n) - n / 2 + 0.5
    xx, yy = np.meshgrid(x, x, indexing="ij")
    r = np.sqrt(xx**2 + yy**2)
    return rho_v + 0.5 * (rho_l - rho_v) * (1.0 - np.tanh((r - radius) / width))


@pytest.mark.fast
def test_phase_separation_conserves_mass():
    """G = -5 < G_c: a perturbed uniform fluid separates into liquid and
    vapor; total mass is exactly conserved (collision + EDM forcing are
    mass-neutral)."""
    init_env(D2Q9)
    n = 64
    grid = grid_factory((n, n))
    nse = IncompressibleNavierStokesStepper(grid, boundary_conditions=())
    sc = ShanChenMultiphaseStepper(nse, G=-5.0)
    rng = np.random.default_rng(7)
    rho0 = 0.7 * (1.0 + 0.02 * rng.standard_normal((n, n)))
    f0 = _uniform_init(nse, rho0)
    f1 = jnp.zeros_like(f0)
    _, _, bm, mm = nse.prepare_fields()
    run = sc.build_multi_step(100)
    fa, fb = f0, f1
    for _ in range(4):  # 400 steps
        fa, fb = run(fa, fb, bm, mm, 1.0)
    rho = np.asarray(jnp.sum(fa.astype(jnp.float32), axis=0))
    assert np.isfinite(rho).all()
    assert rho.max() > 1.5, f"no liquid phase formed (max rho {rho.max():.3f})"
    assert rho.min() < 0.35, f"no vapor phase formed (min rho {rho.min():.3f})"
    np.testing.assert_allclose(rho.sum(), rho0.sum(), rtol=1e-5)


def test_static_droplet_laplace_and_spurious_currents():
    """A liquid droplet in vapor stays stationary: bounded spurious
    currents at the interface, positive Laplace pressure jump, and the
    droplet neither evaporates nor drifts."""
    init_env(D2Q9)
    n = 64
    grid = grid_factory((n, n))
    nse = IncompressibleNavierStokesStepper(grid, boundary_conditions=())
    sc = ShanChenMultiphaseStepper(nse, G=-5.0)
    rho_init = _droplet_rho(n, radius=12.0)
    f0 = _uniform_init(nse, rho_init)
    f1 = jnp.zeros_like(f0)
    _, _, bm, mm = nse.prepare_fields()
    run = sc.build_multi_step(150)
    fa, fb = run(f0, f1, bm, mm, 1.0)
    fa, fb = run(fa, fb, bm, mm, 1.0)

    rho, u_true = sc.macroscopic(fa)
    rho = np.asarray(rho[0])
    umax = float(jnp.abs(u_true).max())
    assert np.isfinite(rho).all()
    assert umax < 0.05, f"spurious currents too large: {umax}"
    assert rho[n // 2, n // 2] > 1.5, "droplet evaporated"
    assert rho[2, 2] < 0.35, "vapor region collapsed"
    p = np.asarray(sc.pressure(jnp.asarray(rho)))
    dp = p[n // 2, n // 2] - p[2, 2]
    assert dp > 0.0, f"Laplace pressure jump should be positive, got {dp}"


def test_multiphase_pallas_matches_jnp():
    """The PALLAS tier (per-voxel force through the fused kernel's aux
    channels) matches the jnp tier to f32 roundoff."""
    import xlb_tpu as xlb
    from xlb_tpu.boundary.registry import boundary_condition_registry

    init_env(D2Q9)
    n = 32
    grid = grid_factory((n, n))
    nse = IncompressibleNavierStokesStepper(grid, boundary_conditions=())
    sc = ShanChenMultiphaseStepper(nse, G=-5.0)
    rng = np.random.default_rng(3)
    rho0 = 0.7 * (1.0 + 0.02 * rng.standard_normal((n, n)))
    f0 = _uniform_init(nse, rho0)
    f1 = jnp.zeros_like(f0)
    _, _, bm, mm = nse.prepare_fields()
    a, b = f0, f1
    for t in range(5):
        a, b = sc(a, b, bm, mm, 1.0, t)
        a, b = b, a
    ref = np.asarray(a)

    boundary_condition_registry.reset()
    init_env(D2Q9, backend=xlb.ComputeBackend.PALLAS)
    grid2 = grid_factory((n, n))
    nse2 = IncompressibleNavierStokesStepper(grid2, boundary_conditions=())
    sc2 = ShanChenMultiphaseStepper(nse2, G=-5.0)
    assert sc2._fused_nse is not None, "PALLAS tier did not build the fused forced step"
    _, _, bm2, mm2 = nse2.prepare_fields()
    a2, b2 = f0, f1
    for t in range(5):
        a2, b2 = sc2(a2, b2, bm2, mm2, 1.0, t)
        a2, b2 = b2, a2
    np.testing.assert_allclose(np.asarray(a2), ref, rtol=2e-6, atol=2e-7)


def test_wettability_contact_angle_sign():
    """psi_wall steers wetting: a droplet sitting on a bottom wall spreads
    (contact area grows) for a wetting wall versus a non-wetting wall."""
    from xlb_tpu.boundary import FullwayBounceBackBC

    contact = {}
    for name, psi_wall in (("wetting", 0.85), ("nonwetting", 0.1)):
        from xlb_tpu.boundary.registry import boundary_condition_registry

        boundary_condition_registry.reset()
        init_env(D2Q9)
        n = 64
        grid = grid_factory((n, n))
        wall = [[x for x in range(n)], [0 for _ in range(n)]]
        nse = IncompressibleNavierStokesStepper(
            grid, boundary_conditions=[FullwayBounceBackBC(indices=wall)]
        )
        sc = ShanChenMultiphaseStepper(nse, G=-5.0, psi_wall=psi_wall)
        # half-droplet resting on the wall
        x = np.arange(n) - n / 2 + 0.5
        y = np.arange(n) - 1.0
        xx, yy = np.meshgrid(x, y, indexing="ij")
        r = np.sqrt(xx**2 + yy**2)
        rho0 = 0.16 + 0.5 * (1.9 - 0.16) * (1.0 - np.tanh((r - 10.0) / 2.0))
        f0 = _uniform_init(nse, rho0)
        f1 = jnp.zeros_like(f0)
        _, _, bm, mm = nse.prepare_fields()
        run = sc.build_multi_step(200)
        fa, fb = run(f0, f1, bm, mm, 1.0)
        rho = np.asarray(jnp.sum(fa.astype(jnp.float32), axis=0))
        assert np.isfinite(rho).all()
        contact[name] = int((rho[:, 1] > 1.0).sum())  # liquid cells touching the wall
    assert contact["wetting"] > contact["nonwetting"], contact

def test_phase_separation_3d():
    """The interaction force is dimension-generic: a 3-D D3Q19 fluid at
    G = -5 separates and conserves mass like the 2-D cases."""
    from xlb_tpu.velocity_set import D3Q19

    init_env(D3Q19)
    n = 24
    grid = grid_factory((n, n, n))
    nse = IncompressibleNavierStokesStepper(grid, boundary_conditions=())
    sc = ShanChenMultiphaseStepper(nse, G=-5.0)
    rng = np.random.default_rng(11)
    rho0 = 0.7 * (1.0 + 0.02 * rng.standard_normal((n, n, n)))
    w = np.asarray(nse.velocity_set._w, np.float32).reshape(-1, 1, 1, 1)
    f0 = jnp.asarray(w * rho0[None].astype(np.float32))
    f1 = jnp.zeros_like(f0)
    _, _, bm, mm = nse.prepare_fields()
    run = sc.build_multi_step(150)
    fa, fb = run(f0, f1, bm, mm, 1.0)
    fa, fb = run(fa, fb, bm, mm, 1.0)
    rho = np.asarray(jnp.sum(fa.astype(jnp.float32), axis=0))
    assert np.isfinite(rho).all()
    assert rho.max() > 1.4 and rho.min() < 0.4, (rho.min(), rho.max())
    np.testing.assert_allclose(rho.sum(), rho0.sum(), rtol=1e-5)
