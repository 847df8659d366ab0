"""Quantify the multires level-interface error: a Taylor-Green vortex
spanning a refined box vs the single-resolution fine-everywhere truth.

The ghost coupling is zeroth-order in time (both fine sub-steps read the
same exploded parent state -- as in the reference), so the interface adds
error beyond pure coarse-grid truncation; this test measures it and pins
two properties:

1. the multires solution stays close to the fine truth (bounded error),
2. refinement HELPS: inside the refined box the multires error is smaller
   than running the whole domain at the coarse resolution.
"""

import numpy as np
import jax.numpy as jnp

from tests.conftest import init_env
from xlb_tpu.velocity_set import D3Q19
from xlb_tpu.grid import grid_factory
from xlb_tpu.grid.multires import MultiresGrid
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.models.multires import MultiresIncompressibleNavierStokesStepper, compute_omega
from xlb_tpu.ops.equilibrium import quadratic_equilibrium
from xlb_tpu.ops import Macroscopic

U0 = 0.03
OMEGA_FINE = 1.2  # finest-level omega; coarse levels get compute_omega


def _tgv_velocity(coords_x, coords_y, coords_z, n_fine):
    """Analytic TGV initial velocity at FINE-grid coordinates."""
    k = 2.0 * np.pi / n_fine
    x, y, z = np.meshgrid(coords_x, coords_y, coords_z, indexing="ij")
    u = np.zeros((3,) + x.shape, dtype=np.float32)
    u[0] = U0 * np.sin(k * x) * np.cos(k * y) * np.cos(k * z)
    u[1] = -U0 * np.cos(k * x) * np.sin(k * y) * np.cos(k * z)
    return u


def _feq_from_u(u, vs, dtype):
    rho = jnp.ones((1,) + u.shape[1:], jnp.float32)
    return np.asarray(quadratic_equilibrium(rho, jnp.asarray(u), vs._c, vs._w, jnp.float32)).astype(dtype)


def _run_single(n, steps, omega, vs):
    import jax

    grid = grid_factory((n, n, n), mesh_shape=(1, 1, 1), devices=jax.devices()[:1])
    st = IncompressibleNavierStokesStepper(grid, boundary_conditions=[])
    f0, f1, bm, mm = st.prepare_fields()
    centers = np.arange(n) + 0.5
    u0 = _tgv_velocity(centers, centers, centers, n)
    f0 = jnp.asarray(_feq_from_u(u0, vs, np.float32))
    fa, fb = f0, f1
    for t in range(steps):
        fa, fb = st(fa, fb, bm, mm, omega, t)
        fa, fb = fb, fa
    _, u = Macroscopic()(fa)
    return np.asarray(u)


def test_vortex_across_level_boundary():
    vs = init_env(D3Q19)
    n_fine = 32  # fine-everywhere truth resolution
    coarse_steps = 10  # = 20 fine steps

    # ---- fine-everywhere truth (at the finest omega) -------------------
    u_truth = _run_single(n_fine, 2 * coarse_steps, OMEGA_FINE, vs)

    # ---- all-coarse run (coarse resolution + coarse omega) -------------
    u_coarse = _run_single(n_fine // 2, coarse_steps, compute_omega(OMEGA_FINE, 1), vs)

    # ---- multires: coarse domain with a centered refined box -----------
    grid = MultiresGrid((16, 16, 16), boxes=[((4, 4, 4), (8, 8, 8))])
    st = MultiresIncompressibleNavierStokesStepper(grid, boundary_conditions={})
    fs, _, bms, mms = st.prepare_fields()
    new_fs = []
    for lvl_idx, lvl in enumerate(grid.levels):
        origin, spacing = grid.level_origin_spacing(lvl_idx)
        # level coords in FINE units (coarsest spacing 1 = 2 fine cells)
        coords = [2.0 * (origin[d] + (np.arange(lvl.shape[d]) + 0.5) * spacing) for d in range(3)]
        u0 = _tgv_velocity(*coords, n_fine=n_fine)
        new_fs.append(jnp.asarray(_feq_from_u(u0, vs, np.float32)))
    fs = new_fs
    for _ in range(coarse_steps):
        fs = st(fs, bms, mms, OMEGA_FINE)
    _, u_fine_lvl = Macroscopic()(fs[0])
    u_fine_lvl = np.asarray(u_fine_lvl)

    # ---- compare inside the refined box (in fine coordinates [8:24)) ---
    box = (slice(None), slice(8, 24), slice(8, 24), slice(8, 24))
    truth_box = u_truth[box]
    mres_err = np.linalg.norm(u_fine_lvl - truth_box) / np.linalg.norm(truth_box)
    # coarse run upsampled (piecewise constant) to fine cells for comparison
    u_coarse_up = np.repeat(np.repeat(np.repeat(u_coarse, 2, 1), 2, 2), 2, 3)
    coarse_err = np.linalg.norm(u_coarse_up[box] - truth_box) / np.linalg.norm(truth_box)

    assert np.isfinite(mres_err) and np.isfinite(coarse_err)
    # interface + coupling error stays bounded...
    assert mres_err < 0.15, f"multires error vs fine truth is {mres_err:.3f}"
    # ...and refinement beats running everything coarse
    assert mres_err < coarse_err, (
        f"refined-box error {mres_err:.3f} should undercut the all-coarse error {coarse_err:.3f}"
    )
