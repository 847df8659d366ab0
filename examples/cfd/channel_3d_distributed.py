"""Multi-chip sharded 3D channel (BASELINE config #5).

A periodic force-driven channel sharded over all available devices on x;
the per-step halo exchange of populations rides ICI via the explicit
shard_map/ppermute wrapper.  On this v5e dev box it runs single-chip; on a
pod slice the same script scales the domain with the device count.
"""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))  # allow running as a script

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

import xlb_tpu as xlb
from xlb_tpu.velocity_set import D3Q19
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.boundary import HalfwayBounceBackBC
from xlb_tpu.parallel import distribute
from xlb_tpu.ops import Macroscopic


def run(cells_per_device_x=64, ny=64, nz=64, num_steps=200, force=5e-7, omega=1.6):
    xlb.init(velocity_set=D3Q19(), default_backend=xlb.ComputeBackend.JAX,
             default_precision_policy=xlb.PrecisionPolicy.FP32FP32)
    n_dev = jax.device_count()
    nx = cells_per_device_x * n_dev
    grid = grid_factory((nx, ny, nz))
    print(f"{n_dev} device(s), domain {nx}x{ny}x{nz} = {nx * ny * nz / 1e6:.1f}M cells, "
          f"sharded {dict(zip(grid.axis_names, grid.mesh_shape))}")

    box = grid.bounding_box_indices()
    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in ("bottom", "top")], axis=1), axis=1)
    stepper = IncompressibleNavierStokesStepper(
        grid,
        boundary_conditions=[HalfwayBounceBackBC(indices=walls.tolist())],
        force_vector=np.array([force, 0.0, 0.0]),
    )
    f_0, f_1, bc_mask, missing_mask = stepper.prepare_fields()
    stepper_d = distribute(stepper, grid, xlb.DefaultConfig.velocity_set)

    @jax.jit
    def window(f_0, f_1):
        def body(t, carry):
            a, b = carry
            a, b = stepper_d(a, b, bc_mask, missing_mask, omega, t)
            return (b, a)

        return jax.lax.fori_loop(0, num_steps, body, (f_0, f_1))

    f_0, f_1 = window(f_0, f_1)  # compile + run
    float(jnp.sum(f_0[0, 0, 0, :8]))
    t0 = time.perf_counter()
    f_0, f_1 = window(f_0, f_1)
    float(jnp.sum(f_0[0, 0, 0, :8]))
    dt = time.perf_counter() - t0

    _, u = Macroscopic()(f_0)
    profile = np.asarray(u)[0].mean(axis=(0, 1))
    mlups = nx * ny * nz * num_steps / dt / 1e6
    print(f"{mlups:.1f} MLUPS total ({mlups / n_dev:.1f}/device); "
          f"centerline u={profile[nz // 2]:.5f}, wall-adjacent u={profile[1]:.6f}, "
          f"finite={np.isfinite(profile).all()}")
    return mlups


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--cells-per-device-x", type=int, default=64)
    args = p.parse_args()
    run(cells_per_device_x=args.cells_per_device_x, num_steps=args.steps)
