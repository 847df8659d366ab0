"""2D flow past a cylinder (BASELINE config #2): D2Q9, halfway bounce-back
cylinder, Zou-He velocity inlet and pressure outlet.

At Re >~ 50 the wake destabilizes into a von Karman street; this script
reports the transverse-velocity oscillation amplitude as the vortex-shedding
signature.
"""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))  # allow running as a script

import argparse

import numpy as np

import xlb_tpu as xlb
from xlb_tpu.velocity_set import D2Q9
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.boundary import ZouHeBC, RegularizedBC, HalfwayBounceBackBC, FullwayBounceBackBC
from xlb_tpu.ops import Macroscopic, MomentumTransfer
from xlb_tpu.utils import omega_from_reynolds


def run(nx=320, ny=128, re=100.0, u_in=0.04, num_steps=8000, probe_every=500, bc="regularized", backend="jax"):
    xlb.init(velocity_set=D2Q9(),
             default_backend=xlb.ComputeBackend.PALLAS if backend == "pallas" else xlb.ComputeBackend.JAX,
             default_precision_policy=xlb.PrecisionPolicy.FP32FP32)
    grid = grid_factory((nx, ny))
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)

    # discrete cylinder
    d = ny // 4
    cx_c, cy_c = nx // 4, ny // 2 + 1  # slight offset trips the instability
    X, Y = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    inside = (X - cx_c) ** 2 + (Y - cy_c) ** 2 <= (d / 2) ** 2
    cyl_idx = np.array(np.nonzero(inside))

    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in ("bottom", "top")], axis=1), axis=1)
    bc_cyl = HalfwayBounceBackBC(indices=cyl_idx.tolist())
    # plain ZouHe pressure outlets destabilize once vortices cross them (the
    # reference's own ZouHe docstring recommends the regularized variant at
    # higher Re); default to RegularizedBC, --bc zouhe for the classic pair
    inout_cls = {"zouhe": ZouHeBC, "regularized": RegularizedBC}[bc]
    bcs = [
        FullwayBounceBackBC(indices=walls.tolist()),
        inout_cls("velocity", prescribed_value=(u_in, 0.0), indices=box_ne["left"]),
        inout_cls("pressure", prescribed_value=1.0, indices=box_ne["right"]),
        bc_cyl,
    ]
    stepper = IncompressibleNavierStokesStepper(grid, boundary_conditions=bcs)
    # start from the uniform inflow to avoid the ZouHe startup pressure shock
    from xlb_tpu.helper.initializers import CustomInitializer

    init = CustomInitializer(rho_0=1.0, u_0=(u_in, 0.0))
    f_0, f_1, bc_mask, missing_mask = stepper.prepare_fields(initializer=init)
    momentum_transfer = MomentumTransfer(bc_cyl)

    omega = omega_from_reynolds(re, u_in, d)
    run_window = stepper.build_multi_step(probe_every, donate=False)

    probe_x, probe_y = cx_c + 2 * d, cy_c
    uy_history, drag_history = [], []
    for start in range(0, num_steps, probe_every):
        f_0, f_1 = run_window(f_0, f_1, bc_mask, missing_mask, omega, start)
        _, u = Macroscopic()(f_0)
        uy_history.append(float(np.asarray(u)[1, probe_x, probe_y]))
        force = np.asarray(momentum_transfer(f_0, f_1, bc_mask, missing_mask))
        drag_history.append(force[0] / (0.5 * u_in**2 * d))

    uy = np.asarray(uy_history)
    amp = uy[len(uy) // 2 :].max() - uy[len(uy) // 2 :].min()
    print(f"cylinder Re={re}: Cd={drag_history[-1]:.3f}, wake u_y amplitude={amp:.2e} "
          f"({'shedding' if amp > 1e-3 * u_in else 'steady'}), finite={np.isfinite(uy).all()}")
    return drag_history, uy_history


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--nx", type=int, default=320)
    p.add_argument("--ny", type=int, default=128)
    p.add_argument("--re", type=float, default=100.0)
    p.add_argument("--steps", type=int, default=8000)
    p.add_argument("--bc", choices=["regularized", "zouhe"], default="regularized")
    p.add_argument("--backend", choices=["jax", "pallas"], default="jax")
    args = p.parse_args()
    run(nx=args.nx, ny=args.ny, re=args.re, num_steps=args.steps, bc=args.bc, backend=args.backend)
