"""Grid-convergence verification: the solver is 2nd-order accurate in space.

Taylor-Green vortex under diffusive scaling (u0 ~ 1/N, steps ~ N^2 at fixed
omega keeps physical time and Reynolds number constant): halving the grid
spacing must cut the L2 velocity error by ~4x.  Measured ratio on this
implementation: 3.90.
"""

import numpy as np
import jax.numpy as jnp

from tests.conftest import init_env
from xlb_tpu.velocity_set import D2Q9
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.ops import Macroscopic
from xlb_tpu.ops.equilibrium import quadratic_equilibrium
from xlb_tpu.utils import viscosity_from_omega
import pytest



def _tgv_l2_error(n, base_n=32, base_u0=0.04, base_steps=200, omega=1.6):
    import jax

    vs = init_env(D2Q9, precision="FP64FP64")
    scale = n // base_n
    u0 = base_u0 / scale
    steps = base_steps * scale * scale
    grid = grid_factory((n, n), mesh_shape=(1, 1), devices=jax.devices()[:1])
    x = (np.arange(n) + 0.5) / n * 2 * np.pi
    X, Y = np.meshgrid(x, x, indexing="ij")
    u_init = np.stack([u0 * np.cos(X) * np.sin(Y), -u0 * np.sin(X) * np.cos(Y)])
    rho = jnp.ones((1, n, n), dtype=jnp.float64)
    f0 = quadratic_equilibrium(rho, jnp.asarray(u_init), vs._c, vs._w, jnp.float64)
    stepper = IncompressibleNavierStokesStepper(grid)
    _, _, bm, mm = stepper.prepare_fields()
    run = stepper.build_multi_step(steps, donate=False)
    f0, _ = run(f0, f0, bm, mm, omega)
    _, u = Macroscopic()(f0)
    nu = viscosity_from_omega(omega)
    k2 = 2 * (2 * np.pi / n) ** 2
    u_exact = u_init * np.exp(-nu * k2 * steps)
    return float(np.sqrt(np.mean((np.asarray(u) - u_exact) ** 2)) / u0)


def test_second_order_spatial_convergence():
    from xlb_tpu.default_config import DefaultConfig
    from xlb_tpu.boundary.registry import boundary_condition_registry

    e_coarse = _tgv_l2_error(32)
    DefaultConfig.reset()
    boundary_condition_registry.reset()
    e_fine = _tgv_l2_error(64)
    ratio = e_coarse / e_fine
    assert 3.0 < ratio < 5.0, f"convergence ratio {ratio:.2f}, expected ~4 (2nd order)"
    assert e_fine < 1.5e-3
