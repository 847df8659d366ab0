"""2D lid-driven cavity (reference examples/cfd/lid_driven_cavity_2d.py).

D2Q9, BGK, EquilibriumBC lid + HalfwayBounceBackBC walls.
"""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))  # allow running as a script


import argparse

import numpy as np

import xlb_tpu as xlb
from xlb_tpu.velocity_set import D2Q9
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.boundary import EquilibriumBC, HalfwayBounceBackBC
from xlb_tpu.ops import Macroscopic
from xlb_tpu.utils import save_image, save_fields_vtk, omega_from_reynolds


def run(n=128, re=200.0, u_lid=0.05, num_steps=2000, io_every=0, precision="FP32FP32"):
    xlb.init(
        velocity_set=D2Q9(),
        default_backend=xlb.ComputeBackend.JAX,
        default_precision_policy=xlb.PrecisionPolicy[precision],
    )
    grid = grid_factory((n, n))
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)
    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in ("bottom", "left", "right")], axis=1), axis=1)

    boundary_conditions = [
        HalfwayBounceBackBC(indices=walls.tolist()),
        EquilibriumBC(rho=1.0, u=(u_lid, 0.0), indices=box_ne["top"]),
    ]
    stepper = IncompressibleNavierStokesStepper(grid, boundary_conditions=boundary_conditions)
    f_0, f_1, bc_mask, missing_mask = stepper.prepare_fields()

    omega = omega_from_reynolds(re, u_lid, n)
    window = io_every or num_steps
    run_window = stepper.build_multi_step(window, donate=False)
    for start in range(0, num_steps, window):
        f_0, f_1 = run_window(f_0, f_1, bc_mask, missing_mask, omega, start)
        if io_every:
            rho, u = Macroscopic()(f_0)
            save_image(np.asarray(u), timestep=start + window, prefix="cavity_u")

    rho, u = Macroscopic()(f_0)
    u = np.asarray(u)
    print(f"cavity {n}x{n} Re={re}: max|u|={np.abs(u).max():.4f}, mean rho={np.asarray(rho).mean():.6f}")
    if io_every:
        save_fields_vtk({"u": u, "rho": np.asarray(rho)}, timestep=num_steps, prefix="cavity")
    return u


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=128)
    p.add_argument("--re", type=float, default=200.0)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--io-every", type=int, default=0)
    args = p.parse_args()
    run(n=args.n, re=args.re, num_steps=args.steps, io_every=args.io_every)
