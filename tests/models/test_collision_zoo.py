"""TRT and MRT collision operators (beyond-reference additions).

The reference's collision zoo is BGK/KBC/LES (xlb/operator/collision/);
TRT (Ginzburg two-relaxation-time) and MRT (d'Humieres moment-space
relaxation) have no counterpart there.  Anchors:

- MRT projectors partition the identity exactly (orthogonal moment basis).
- MRT with every rate tied to omega IS BGK; TRT with magic = (tau-1/2)^2 IS
  BGK -- both identities hold to f32 roundoff, pinning the formulations.
- Both conserve mass and momentum and leave equilibrium invariant.
- Both reproduce the analytic Taylor-Green viscosity (the shear rate alone
  sets nu), while ghost relaxation changes the populations themselves.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import init_env
from xlb_tpu.velocity_set import D2Q9, D3Q19, D3Q27
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper


ALL_SETS = [D2Q9, D3Q19, D3Q27]


@pytest.mark.parametrize("vs_cls", ALL_SETS)
@pytest.mark.fast
def test_mrt_projectors_partition_identity(vs_cls):
    vs = init_env(vs_cls)
    from xlb_tpu.ops.collision import mrt_projectors

    P = mrt_projectors(vs)
    total = sum(P.values())
    np.testing.assert_allclose(total, np.eye(vs.q), atol=1e-10)
    # each projector is idempotent and symmetric
    for name, p in P.items():
        np.testing.assert_allclose(p @ p, p, atol=1e-10, err_msg=name)
        np.testing.assert_allclose(p, p.T, atol=1e-12, err_msg=name)
    # expected subspace dimensions: d+1 conserved, 1 bulk,
    # d(d+1)/2 - 1 shear (traceless symmetric), rest ghost
    d = vs.d
    assert round(np.trace(P["conserved"])) == d + 1
    assert round(np.trace(P["bulk"])) == 1
    assert round(np.trace(P["shear"])) == d * (d + 1) // 2 - 1


@pytest.mark.parametrize("vs_cls,shape", [(D2Q9, (8, 8)), (D3Q19, (5, 5, 5)), (D3Q27, (5, 5, 5))])
@pytest.mark.fast
def test_mrt_all_omega_rates_equals_bgk(vs_cls, shape):
    vs = init_env(vs_cls)
    from xlb_tpu.ops import MRT, BGK, QuadraticEquilibrium, Macroscopic

    rng = np.random.default_rng(7)
    f = jnp.asarray(0.5 + rng.random((vs.q, *shape), dtype=np.float32))
    feq = QuadraticEquilibrium()(*Macroscopic()(f))
    mrt = MRT(bulk_rate=None, ghost_rate=None)
    assert mrt.fixed_projectors == []
    out_mrt = mrt(f, feq, 1.37)
    out_bgk = BGK()(f, feq, 1.37)
    np.testing.assert_allclose(np.asarray(out_mrt), np.asarray(out_bgk), rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("vs_cls,shape", [(D2Q9, (8, 8)), (D3Q19, (5, 5, 5))])
@pytest.mark.fast
def test_mrt_conserves_and_fixes_equilibrium(vs_cls, shape):
    vs = init_env(vs_cls)
    from xlb_tpu.ops import MRT, QuadraticEquilibrium, Macroscopic

    rng = np.random.default_rng(8)
    f = jnp.asarray(0.5 + rng.random((vs.q, *shape), dtype=np.float32))
    rho_in, u_in = Macroscopic()(f)
    feq = QuadraticEquilibrium()(rho_in, u_in)
    mrt = MRT(bulk_rate=1.4, ghost_rate=1.0)
    out = mrt(f, feq, 0.9)
    rho_out, u_out = Macroscopic()(out)
    np.testing.assert_allclose(np.asarray(rho_out), np.asarray(rho_in), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(u_out * rho_out), np.asarray(u_in * rho_in), atol=2e-6
    )
    # equilibrium is a fixed point for every rate choice
    out_eq = mrt(feq, feq, 0.9)
    np.testing.assert_allclose(np.asarray(out_eq), np.asarray(feq), rtol=1e-5, atol=1e-7)


@pytest.mark.fast
def test_trt_reduces_to_bgk_at_matching_magic():
    """magic = (tau+ - 1/2)^2 makes omega_minus == omega, i.e. exactly BGK."""
    vs = init_env(D3Q19)
    from xlb_tpu.ops import TRT, BGK, QuadraticEquilibrium, Macroscopic

    omega = 1.21
    magic = (1.0 / omega - 0.5) ** 2
    rng = np.random.default_rng(9)
    shape = (5, 5, 5)
    f = jnp.asarray(0.5 + rng.random((vs.q, *shape), dtype=np.float32))
    feq = QuadraticEquilibrium()(*Macroscopic()(f))
    out_trt = TRT(magic=magic)(f, feq, omega)
    out_bgk = BGK()(f, feq, omega)
    np.testing.assert_allclose(np.asarray(out_trt), np.asarray(out_bgk), rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("vs_cls,shape", [(D2Q9, (8, 8)), (D3Q27, (5, 5, 5))])
@pytest.mark.fast
def test_trt_conserves_mass_momentum(vs_cls, shape):
    vs = init_env(vs_cls)
    from xlb_tpu.ops import TRT, QuadraticEquilibrium, Macroscopic

    rng = np.random.default_rng(10)
    f = jnp.asarray(0.5 + rng.random((vs.q, *shape), dtype=np.float32))
    rho_in, u_in = Macroscopic()(f)
    feq = QuadraticEquilibrium()(rho_in, u_in)
    out = TRT(magic=0.25)(f, feq, 1.6)
    rho_out, u_out = Macroscopic()(out)
    np.testing.assert_allclose(np.asarray(rho_out), np.asarray(rho_in), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(u_out * rho_out), np.asarray(u_in * rho_in), atol=2e-6
    )


def _tgv_ke_ratio(collision_type, collision_params, n=64, steps=200, omega=1.25):
    """Taylor-Green KE decay ratio vs the analytic exp(-2 nu k^2 t)."""
    vs = init_env(D2Q9)
    from xlb_tpu.ops import Macroscopic
    from xlb_tpu.ops.equilibrium import quadratic_equilibrium

    grid = grid_factory((n, n))
    stepper = IncompressibleNavierStokesStepper(
        grid, collision_type=collision_type, collision_params=collision_params
    )
    f_0, f_1, bc_mask, missing_mask = stepper.prepare_fields()
    u0 = 0.01
    x = (np.arange(n) + 0.5) / n * 2 * np.pi
    X, Y = np.meshgrid(x, x, indexing="ij")
    u = jnp.asarray(np.stack([u0 * np.cos(X) * np.sin(Y), -u0 * np.sin(X) * np.cos(Y)]), dtype=jnp.float32)
    rho = jnp.ones((1, n, n), dtype=jnp.float32)
    f_0 = quadratic_equilibrium(rho, u, vs._c, vs._w, jnp.float32)

    nu = (1.0 / omega - 0.5) / 3.0
    k2 = 2 * (2 * np.pi / n) ** 2
    ke0 = float(jnp.sum(u**2))
    run = stepper.build_multi_step(steps)
    f_0, f_1 = run(f_0, f_1, bc_mask, missing_mask, omega, 0)
    _, u_t = Macroscopic()(f_0)
    ke = float(jnp.sum(u_t**2))
    return ke / (ke0 * np.exp(-2 * nu * k2 * steps))


@pytest.mark.parametrize(
    "collision_type,params",
    [("TRT", {"magic": 0.25}), ("MRT", {"bulk_rate": 1.3, "ghost_rate": 1.0})],
)
def test_taylor_green_viscosity_set_by_shear_rate_only(collision_type, params):
    """nu comes from the shear relaxation alone: TRT/MRT with non-BGK odd/
    ghost rates must still match the analytic Taylor-Green decay."""
    ratio = _tgv_ke_ratio(collision_type, params)
    assert abs(ratio - 1.0) < 0.03, f"{collision_type} KE decay off: ratio={ratio:.4f}"


@pytest.mark.fast
def test_power_law_n1_is_newtonian_bgk():
    """n = 1: nu = K exactly, independent of shear -- equals BGK at
    omega = 1 / (3 K + 1/2) for any seed omega."""
    vs = init_env(D3Q19)
    from xlb_tpu.ops import PowerLawBGK, BGK, QuadraticEquilibrium, Macroscopic

    K = 0.04
    om_newt = 1.0 / (3.0 * K + 0.5)
    rng = np.random.default_rng(11)
    shape = (5, 5, 5)
    f = jnp.asarray(0.5 + rng.random((vs.q, *shape), dtype=np.float32))
    feq = QuadraticEquilibrium()(*Macroscopic()(f))
    out_pl = PowerLawBGK(consistency=K, power_index=1.0)(f, feq, 0.9)
    out_bgk = BGK()(f, feq, om_newt)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_bgk), rtol=1e-5, atol=1e-7)


@pytest.mark.fast
def test_power_law_conserves_mass_momentum():
    vs = init_env(D2Q9)
    from xlb_tpu.ops import PowerLawBGK, QuadraticEquilibrium, Macroscopic

    rng = np.random.default_rng(12)
    shape = (8, 8)
    f = jnp.asarray(0.5 + rng.random((vs.q, *shape), dtype=np.float32))
    rho_in, u_in = Macroscopic()(f)
    feq = QuadraticEquilibrium()(rho_in, u_in)
    out = PowerLawBGK(consistency=0.02, power_index=0.7)(f, feq, 1.2)
    rho_out, u_out = Macroscopic()(out)
    np.testing.assert_allclose(np.asarray(rho_out), np.asarray(rho_in), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(u_out * rho_out), np.asarray(u_in * rho_in), atol=2e-6)


def test_power_law_poiseuille_profile():
    """Force-driven channel of a shear-thinning (n = 0.8) power-law fluid:
    steady u(y) = (n/(n+1)) (g/K)^(1/n) (h^(1+1/n) - |y - yc|^(1+1/n)).
    Fullway walls put the no-slip planes half a link inside the wall rows
    (same convention as the Newtonian Poiseuille test)."""
    import jax.numpy as jnp
    from xlb_tpu.boundary import FullwayBounceBackBC
    from xlb_tpu.ops import Macroscopic

    vs = init_env(D2Q9, precision="FP64FP64")
    nx, ny = 4, 34
    grid = grid_factory((nx, ny), mesh_shape=(1, 1), devices=__import__("jax").devices()[:1])
    g, K, n = 1e-6, 0.02, 0.8
    box = grid.bounding_box_indices()
    walls = np.unique(np.concatenate([np.asarray(box["bottom"]), np.asarray(box["top"])], axis=1), axis=1)
    stepper = IncompressibleNavierStokesStepper(
        grid,
        boundary_conditions=[FullwayBounceBackBC(indices=walls.tolist())],
        collision_type="PowerLawBGK",
        collision_params={"consistency": K, "power_index": n},
        force_vector=np.array([g, 0.0]),
    )
    f0, f1, bm, mm = stepper.prepare_fields()
    run = stepper.build_multi_step(60000, donate=False)
    f0, f1 = run(f0, f1, bm, mm, 1.0)

    _, u = Macroscopic()(f0)
    profile = np.asarray(u)[0, nx // 2, 1:-1]
    y = np.arange(1, ny - 1).astype(np.float64)
    yc, h = (ny - 1) / 2.0, (ny - 2) / 2.0
    analytic = (n / (n + 1.0)) * (g / K) ** (1.0 / n) * (
        h ** (1.0 + 1.0 / n) - np.abs(y - yc) ** (1.0 + 1.0 / n)
    )
    np.testing.assert_allclose(profile, analytic, rtol=0.08, atol=2e-5)
