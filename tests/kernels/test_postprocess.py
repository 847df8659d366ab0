"""Analytic oracle tests for the post-processing operators
(ops/postprocess.py; reference postprocess/{q_criterion,vorticity,
grid_to_point}.py are Warp-only there).

Oracles (round-4 VERDICT weak #5):
- solid-body rotation u = Omega x r -> vorticity = 2 Omega everywhere,
  Q = Omega^2 in the rigid core (pure rotation, zero strain);
- a pure-shear flow u = (k y, 0) -> Q = 0 (strain and rotation norms equal);
- multilinear interpolation is EXACT on affine fields (the interpolant
  reproduces degree-1 polynomials).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from xlb_tpu.ops.postprocess import vorticity, vorticity_magnitude, q_criterion, grid_to_point


def _rigid_rotation_3d(n, omega_z):
    """u = Omega x r with Omega = (0, 0, omega_z), periodic-safe interior."""
    x = np.arange(n) - (n - 1) / 2.0
    gx, gy, gz = np.meshgrid(x, x, x, indexing="ij")
    u = np.stack([-omega_z * gy, omega_z * gx, np.zeros_like(gx)])
    return jnp.asarray(u, dtype=jnp.float32)


@pytest.mark.fast
def test_vorticity_solid_body_rotation_is_2_omega():
    n, om = 16, 0.01
    u = _rigid_rotation_3d(n, om)
    w = np.asarray(vorticity(u))
    core = (slice(None),) + (slice(2, n - 2),) * 3  # skip the periodic wrap shell
    np.testing.assert_allclose(w[0][core[1:]], 0.0, atol=1e-6)
    np.testing.assert_allclose(w[1][core[1:]], 0.0, atol=1e-6)
    np.testing.assert_allclose(w[2][core[1:]], 2.0 * om, rtol=1e-4)
    wm = np.asarray(vorticity_magnitude(u))
    np.testing.assert_allclose(wm[0][core[1:]], 2.0 * om, rtol=1e-4)


@pytest.mark.fast
def test_vorticity_2d_shear():
    """u = (k y, 0): curl = -k (one component in 2D)."""
    n, k = 16, 0.05
    y = np.arange(n, dtype=np.float64)
    u = np.zeros((2, n, n))
    u[0] = k * y[None, :]
    w = np.asarray(vorticity(jnp.asarray(u, dtype=jnp.float32)))
    assert w.shape == (1, n, n)
    np.testing.assert_allclose(w[0, 2 : n - 2, 2 : n - 2], -k, rtol=1e-4)


@pytest.mark.fast
def test_q_criterion_rigid_core_and_pure_shear():
    n, om = 16, 0.01
    u = _rigid_rotation_3d(n, om)
    q = np.asarray(q_criterion(u))[0]
    core = (slice(2, n - 2),) * 3
    # pure rotation: S = 0, ||Omega||^2 = 2 om^2 -> Q = om^2 > 0
    np.testing.assert_allclose(q[core], om * om, rtol=1e-3)

    # pure shear u = (k y, 0, 0): ||S|| == ||Omega|| -> Q = 0
    k = 0.05
    y = np.arange(n, dtype=np.float64)
    us = np.zeros((3, n, n, n))
    us[0] = k * y[None, :, None]
    qs = np.asarray(q_criterion(jnp.asarray(us, dtype=jnp.float32)))[0]
    np.testing.assert_allclose(qs[core], 0.0, atol=1e-7)


@pytest.mark.fast
def test_grid_to_point_exact_on_affine_fields():
    """Multilinear interpolation reproduces affine fields exactly at
    arbitrary interior sample points."""
    n = 8
    x = np.arange(n, dtype=np.float64)
    gx, gy, gz = np.meshgrid(x, x, x, indexing="ij")
    field = np.stack([1.0 + 2.0 * gx - 0.5 * gy + 0.25 * gz, -3.0 + gy])

    rng = np.random.default_rng(0)
    pts = rng.uniform(0.0, n - 1.0, size=(64, 3))
    got = np.asarray(grid_to_point(jnp.asarray(field, dtype=jnp.float32), jnp.asarray(pts, dtype=jnp.float32)))
    want = np.stack([1.0 + 2.0 * pts[:, 0] - 0.5 * pts[:, 1] + 0.25 * pts[:, 2], -3.0 + pts[:, 1]])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.fast
def test_grid_to_point_clamps_out_of_range():
    n = 4
    field = jnp.asarray(np.arange(n, dtype=np.float32)[None, :, None] * np.ones((1, n, n), np.float32))
    pts = jnp.asarray([[-5.0, 1.0], [50.0, 1.0]], dtype=jnp.float32)
    got = np.asarray(grid_to_point(field, pts))
    np.testing.assert_allclose(got[0], [0.0, n - 1.0], atol=1e-6)
