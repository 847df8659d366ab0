"""3D turbulent channel flow driven by a body force
(reference examples/cfd/turbulent_channel_3d.py).

D3Q27 KBC + exact-difference forcing; halfway bounce-back walls in z,
periodic in x/y.  Validates the mean streamwise profile against the log law
at long times (here we just run and report the profile shape).
"""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))  # allow running as a script


import argparse

import numpy as np
import jax.numpy as jnp

import xlb_tpu as xlb
from xlb_tpu.velocity_set import D3Q27
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.boundary import HalfwayBounceBackBC
from xlb_tpu.ops import Macroscopic
from xlb_tpu.helper.initializers import initialize_from_macroscopic


def run(nx=64, ny=32, nz=32, re_tau=60.0, u_tau=0.002, num_steps=1000, seed=0):
    xlb.init(velocity_set=D3Q27(), default_backend=xlb.ComputeBackend.JAX,
             default_precision_policy=xlb.PrecisionPolicy.FP32FP32)
    grid = grid_factory((nx, ny, nz))
    vs = xlb.DefaultConfig.velocity_set

    # friction-scaling setup (reference turbulent_channel_3d.py:38-63)
    h = nz / 2.0
    visc = u_tau * h / re_tau
    omega = 1.0 / (3.0 * visc + 0.5)
    force_x = u_tau**2 / h  # constant pressure-gradient surrogate

    box = grid.bounding_box_indices()
    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in ("bottom", "top")], axis=1), axis=1)
    bc_walls = HalfwayBounceBackBC(indices=walls.tolist())

    stepper = IncompressibleNavierStokesStepper(
        grid,
        boundary_conditions=[bc_walls],
        collision_type="KBC",
        force_vector=np.array([force_x, 0.0, 0.0]),
    )
    f_0, f_1, bc_mask, missing_mask = stepper.prepare_fields()

    # seeded perturbed initial velocity to trip transition
    rng = np.random.default_rng(seed)
    z = (np.arange(nz) + 0.5) / nz
    u_profile = 10 * u_tau * (1 - (2 * z - 1) ** 2)
    u0 = np.zeros((3, nx, ny, nz), dtype=np.float32)
    u0[0] = u_profile[None, None, :]
    u0 += (0.05 * 10 * u_tau * rng.standard_normal(u0.shape)).astype(np.float32)
    rho0 = np.ones((1, nx, ny, nz), dtype=np.float32)
    f_0 = initialize_from_macroscopic(grid, vs, xlb.DefaultConfig.default_precision_policy, rho0, u0)

    run_window = stepper.build_multi_step(num_steps, donate=False)
    f_0, f_1 = run_window(f_0, f_1, bc_mask, missing_mask, omega)

    rho, u = Macroscopic()(f_0)
    u = np.asarray(u)
    mean_profile = u[0].mean(axis=(0, 1))
    print(f"channel Re_tau={re_tau}: bulk u={u[0].mean():.5f}, centerline={mean_profile[nz // 2]:.5f}, "
          f"wall-adjacent={mean_profile[0]:.5f}, finite={np.isfinite(u).all()}")
    return mean_profile


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1000)
    args = p.parse_args()
    run(num_steps=args.steps)
