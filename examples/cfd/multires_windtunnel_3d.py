"""Multi-resolution wind tunnel with drag/lift readout
(reference examples/cfd/multires_windtunnel_3d.py).

A coarse tunnel with a 2x-refined box around the object: KBC D3Q27,
EquilibriumBC inlet + ExtrapolationOutflowBC outlet + bounce-back walls on
the coarse level, halfway bounce-back on the object voxelized at the FINE
level (per-level mesh attachment), and MultiresMomentumTransfer drag/lift
integration at the fine level.  Mesh coordinates are in coarse-level cells;
forces come out in fine-level lattice units (acoustic scaling keeps
velocities level-invariant), so the drag coefficient normalizes with the
fine-cell object size.
"""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))  # allow running as a script

import argparse

import numpy as np

import xlb_tpu as xlb
from xlb_tpu.velocity_set import D3Q27
from xlb_tpu.grid.multires import MultiresGrid
from xlb_tpu.grid.grid import Grid
from xlb_tpu.helper.simulation_manager import MultiresSimulationManager
from xlb_tpu.geometry import load_stl, sphere_triangles, transform_mesh
from xlb_tpu.boundary import EquilibriumBC, ExtrapolationOutflowBC, FullwayBounceBackBC, HalfwayBounceBackBC
from xlb_tpu.ops import MultiresMomentumTransfer
from xlb_tpu.utils import omega_from_reynolds


def run(nx=64, nyz=32, re=200.0, u_in=0.04, coarse_steps=200, stl=None, print_every=50):
    xlb.init(velocity_set=D3Q27(), default_backend=xlb.ComputeBackend.JAX,
             default_precision_policy=xlb.PrecisionPolicy.FP32FP32)

    # refined box around the object (coarse-cell coordinates)
    center = np.array([nx / 4, nyz / 2, nyz / 2])
    radius = nyz / 8  # coarse cells
    ext = tuple(int(2 * radius) + 4 for _ in range(3))
    origin = tuple(int(c - e / 2) for c, e in zip(center, ext))
    grid = MultiresGrid((nx, nyz, nyz), boxes=[(origin, ext)])
    print(f"levels: {[lvl.shape for lvl in grid.levels]}, fine box @ {origin} extent {ext}")

    if stl:
        tris = load_stl(stl)
        lo, hi = tris.min(axis=(0, 1)), tris.max(axis=(0, 1))
        scale = (2 * radius) / max(hi - lo)
        tris = transform_mesh(tris, scale=scale, translation=center - scale * (lo + hi) / 2)
        size_fine = float(max(hi - lo)) * scale * 2  # fine cells
    else:
        tris = sphere_triangles(center=center, radius=radius, subdivisions=3)
        size_fine = 2 * radius * 2  # diameter in fine cells

    helper = Grid((nx, nyz, nyz), mesh_shape=(1, 1, 1), devices=__import__("jax").devices()[:1])
    box = helper.bounding_box_indices()
    box_ne = helper.bounding_box_indices(remove_edges=True)
    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in ("bottom", "top", "front", "back")], axis=1), axis=1)

    bc_object = HalfwayBounceBackBC(mesh_vertices=tris)
    bcs = {
        0: [bc_object],
        grid.num_levels - 1: [
            FullwayBounceBackBC(indices=walls.tolist()),
            EquilibriumBC(rho=1.0, u=(u_in, 0.0, 0.0), indices=box_ne["left"]),
            ExtrapolationOutflowBC(indices=box_ne["right"]),
        ],
    }

    omega = omega_from_reynolds(re, u_in, size_fine)
    sim = MultiresSimulationManager(grid, omega_finest=omega, boundary_conditions=bcs, collision_type="KBC")
    mt = MultiresMomentumTransfer(bc_object, level=0)

    area = np.pi * (size_fine / 2) ** 2  # frontal area in fine cells^2
    drag_history = []
    for step in range(coarse_steps):
        force = np.asarray(sim.step_with_force(mt))
        cd = 2.0 * force[0] / (u_in**2 * area)
        cl = 2.0 * force[2] / (u_in**2 * area)
        drag_history.append(cd)
        if print_every and (step + 1) % print_every == 0:
            print(f"coarse step {step + 1}: Cd={cd:.4f} Cl={cl:.4f} Fx={force[0]:.3e}")
    return drag_history


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--nx", type=int, default=64)
    p.add_argument("--nyz", type=int, default=32)
    p.add_argument("--re", type=float, default=200.0)
    p.add_argument("--stl", type=str, default=None)
    args = p.parse_args()
    run(nx=args.nx, nyz=args.nyz, re=args.re, coarse_steps=args.steps, stl=args.stl)
