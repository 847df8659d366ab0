"""3D flow past a sphere (reference examples/cfd/flow_past_sphere_3d.py).

D3Q19 BGK; RegularizedBC velocity inlet, ExtrapolationOutflowBC outlet,
halfway bounce-back on the sphere (mesh-voxelized) and channel walls.
"""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))  # allow running as a script


import argparse

import numpy as np

import xlb_tpu as xlb
from xlb_tpu.velocity_set import D3Q19
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.boundary import RegularizedBC, ExtrapolationOutflowBC, HalfwayBounceBackBC
from xlb_tpu.geometry import sphere_triangles
from xlb_tpu.ops import Macroscopic
from xlb_tpu.utils import omega_from_reynolds


def run(nx=96, nyz=48, re=100.0, u_in=0.04, num_steps=1000, inlet="parabolic"):
    xlb.init(velocity_set=D3Q19(), default_backend=xlb.ComputeBackend.JAX,
             default_precision_policy=xlb.PrecisionPolicy.FP32FP32)
    grid = grid_factory((nx, nyz, nyz))
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)

    sphere_r = nyz // 8
    sphere = sphere_triangles(center=(nx / 4, nyz / 2, nyz / 2), radius=sphere_r, subdivisions=3)

    walls = np.unique(
        np.concatenate([np.asarray(box[k]) for k in ("bottom", "top", "front", "back")], axis=1), axis=1
    )
    bc_walls = HalfwayBounceBackBC(indices=walls.tolist())
    if inlet == "parabolic":
        # per-voxel parabolic profile u = u_max (1 - r^2), the reference's
        # default inlet (flow_past_sphere_3d.py:86-107); runs in the fused
        # kernel via the aux prescribed-velocity field
        yz = (np.arange(nyz) + 0.5) / nyz - 0.5
        ry, rz = np.meshgrid(2.0 * yz, 2.0 * yz, indexing="ij")
        prescribed = np.zeros((3, 1, nyz, nyz))
        prescribed[0, 0] = u_in * np.maximum(0.0, 1.0 - ry**2 - rz**2)
        bc_inlet = RegularizedBC("velocity", profile=lambda: prescribed, indices=box_ne["left"])
    else:
        bc_inlet = RegularizedBC("velocity", prescribed_value=(u_in, 0.0, 0.0), indices=box_ne["left"])
    bc_outlet = ExtrapolationOutflowBC(indices=box_ne["right"])
    bc_sphere = HalfwayBounceBackBC(mesh_vertices=sphere)

    stepper = IncompressibleNavierStokesStepper(
        grid, boundary_conditions=[bc_walls, bc_inlet, bc_outlet, bc_sphere]
    )
    f_0, f_1, bc_mask, missing_mask = stepper.prepare_fields()

    omega = omega_from_reynolds(re, u_in, 2 * sphere_r)
    run_window = stepper.build_multi_step(num_steps, donate=False)
    f_0, f_1 = run_window(f_0, f_1, bc_mask, missing_mask, omega)

    rho, u = Macroscopic()(f_0)
    u = np.asarray(u)
    print(
        f"flow past sphere: inflow={u_in}, max|u|={np.abs(u).max():.4f}, "
        f"wake u_x={u[0, nx // 2, nyz // 2, nyz // 2]:.4f}, finite={np.isfinite(u).all()}"
    )
    return u


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--nx", type=int, default=96)
    p.add_argument("--nyz", type=int, default=48)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--inlet", choices=["parabolic", "uniform"], default="parabolic")
    args = p.parse_args()
    run(nx=args.nx, nyz=args.nyz, num_steps=args.steps, inlet=args.inlet)
