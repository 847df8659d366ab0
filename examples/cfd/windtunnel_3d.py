"""3D wind tunnel over an STL object with drag/lift readout
(reference examples/cfd/windtunnel_3d.py).

D3Q27 KBC; EquilibriumBC inlet, ExtrapolationOutflowBC outlet, halfway
bounce-back or hybrid curved-boundary treatment on the voxelized object
(--object-bc hybrid), MomentumTransfer drag/lift integration.
"""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))  # allow running as a script


import argparse

import numpy as np

import xlb_tpu as xlb
from xlb_tpu.velocity_set import D3Q27
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.boundary import EquilibriumBC, ExtrapolationOutflowBC, HalfwayBounceBackBC, FullwayBounceBackBC
from xlb_tpu.geometry import load_stl, sphere_triangles, transform_mesh
from xlb_tpu.ops import Macroscopic, MomentumTransfer
from xlb_tpu.utils import omega_from_reynolds


def run(nx=96, nyz=48, re=200.0, u_in=0.04, num_steps=1000, stl=None, print_every=200, backend="jax", object_bc="halfway"):
    xlb.init(velocity_set=D3Q27(), default_backend=xlb.ComputeBackend.JAX,
             default_precision_policy=xlb.PrecisionPolicy.FP32FP32)
    grid = grid_factory((nx, nyz, nyz))
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)

    if stl:
        tris = load_stl(stl)
        # normalize into the tunnel: center at (nx/4, nyz/2, nyz/2), size nyz/3
        lo, hi = tris.min(axis=(0, 1)), tris.max(axis=(0, 1))
        scale = (nyz / 3.0) / max(hi - lo)
        tris = transform_mesh(tris, scale=scale, translation=np.array([nx / 4, nyz / 2, nyz / 2]) - scale * (lo + hi) / 2)
        size = float(max(hi - lo)) * scale
    else:
        size = nyz / 4
        tris = sphere_triangles(center=(nx / 4, nyz / 2, nyz / 2), radius=size / 2, subdivisions=3)

    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in ("bottom", "top", "front", "back")], axis=1), axis=1)
    bc_walls = FullwayBounceBackBC(indices=walls.tolist())
    bc_inlet = EquilibriumBC(rho=1.0, u=(u_in, 0.0, 0.0), indices=box_ne["left"])
    bc_outlet = ExtrapolationOutflowBC(indices=box_ne["right"])
    if object_bc == "hybrid":
        # curved-boundary treatment with per-link mesh distances (the
        # reference's commented-out variant, windtunnel_3d.py:107-108);
        # runs in the fused kernel via the aux weight channels
        from xlb_tpu.boundary import HybridBC

        bc_object = HybridBC(bc_method="nonequilibrium_regularized", mesh_vertices=tris)
    else:
        bc_object = HalfwayBounceBackBC(mesh_vertices=tris)

    stepper = IncompressibleNavierStokesStepper(
        grid, boundary_conditions=[bc_walls, bc_inlet, bc_outlet, bc_object], collision_type="KBC"
    )
    f_0, f_1, bc_mask, missing_mask = stepper.prepare_fields()

    momentum_transfer = MomentumTransfer(bc_object)
    omega = omega_from_reynolds(re, u_in, size)
    window = print_every or num_steps

    if backend == "pallas":
        # all BCs in this scene run inside the fused kernel
        import jax
        from xlb_tpu.kernels.fused_step import build_fused_step

        fused = build_fused_step(stepper)

        @jax.jit
        def run_window(f_0, f_1, bc_mask, missing_mask, omega, start=0):
            def body(t, carry):
                a, b = carry
                a, b = fused(a, b, bc_mask, missing_mask, omega, start + t)
                return (b, a)

            return jax.lax.fori_loop(0, window, body, (f_0, f_1))
    else:
        run_window = stepper.build_multi_step(window, donate=False)

    drag_history = []
    for start in range(0, num_steps, window):
        f_0, f_1 = run_window(f_0, f_1, bc_mask, missing_mask, omega, start)
        t = start + window - 1
        if print_every:
            force = np.asarray(momentum_transfer(f_0, f_1, bc_mask, missing_mask))
            area = np.pi * (size / 2) ** 2
            cd = force[0] / (0.5 * u_in**2 * area)
            cl = force[2] / (0.5 * u_in**2 * area)
            drag_history.append(cd)
            print(f"step {t + 1}: drag force={force[0]:.5e}, Cd={cd:.3f}, Cl={cl:.3f}")

    rho, u = Macroscopic()(f_0)
    print(f"windtunnel done: max|u|={np.abs(np.asarray(u)).max():.4f}")
    return drag_history


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--nx", type=int, default=96)
    p.add_argument("--nyz", type=int, default=48)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--stl", type=str, default=None)
    p.add_argument("--backend", choices=["jax", "pallas"], default="jax")
    p.add_argument("--object-bc", choices=["halfway", "hybrid"], default="halfway")
    args = p.parse_args()
    run(nx=args.nx, nyz=args.nyz, num_steps=args.steps, stl=args.stl, backend=args.backend, object_bc=args.object_bc)
