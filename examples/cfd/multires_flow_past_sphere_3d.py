"""Multi-resolution flow past a sphere
(reference examples/cfd/multires_flow_past_sphere_3d.py).

Coarse outer domain with a 2x-refined box around the sphere built by
make_cuboid_mesh; walls on the coarse level, sphere bounce-back on the fine
level.
"""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))  # allow running as a script

import argparse

import numpy as np
import jax.numpy as jnp

import xlb_tpu as xlb
from xlb_tpu.velocity_set import D3Q19
from xlb_tpu.utils.mesher import make_cuboid_mesh, MultiresIO
from xlb_tpu.helper.simulation_manager import MultiresSimulationManager
from xlb_tpu.geometry import sphere_triangles, voxelize, solid_voxel_indices
from xlb_tpu.boundary import HalfwayBounceBackBC, EquilibriumBC
from xlb_tpu.ops.equilibrium import quadratic_equilibrium


def run(coarse_n=(64, 32, 32), re=100.0, u_in=0.03, coarse_steps=100, export=False):
    xlb.init(velocity_set=D3Q19(), default_backend=xlb.ComputeBackend.JAX,
             default_precision_policy=xlb.PrecisionPolicy.FP32FP32)
    vs = xlb.DefaultConfig.velocity_set

    # finest-level domain = 2x the coarse shape; sphere in the first third
    fine_shape = tuple(2 * s for s in coarse_n)
    center_f = np.array([fine_shape[0] / 3, fine_shape[1] / 2, fine_shape[2] / 2])
    radius_f = fine_shape[1] / 8
    bbox = (center_f - 1.2 * radius_f, center_f + 1.2 * radius_f)
    grid = make_cuboid_mesh(fine_shape, bbox, level_multipliers=(2.0,))
    fine = grid.levels[0]
    print(f"levels: {[lvl.shape for lvl in grid.levels]}, fine box @ {fine.origin_in_parent}")

    # sphere voxelized on the FINE level (its local coords)
    fine_origin_f = 2 * np.asarray(fine.origin_in_parent)  # finest units
    tris = sphere_triangles(center=center_f - fine_origin_f, radius=radius_f, subdivisions=3)
    sphere_idx = solid_voxel_indices(voxelize(tris, fine.shape))

    # BCs: inlet/walls on the coarse level, sphere on the fine level
    coarse = grid.levels[-1]
    from xlb_tpu.grid.grid import Grid

    helper = Grid(coarse.shape, mesh_shape=(1, 1, 1), devices=__import__("jax").devices()[:1])
    box_ne = helper.bounding_box_indices(remove_edges=True)
    bcs = {
        0: [HalfwayBounceBackBC(indices=sphere_idx.tolist())],
        grid.num_levels - 1: [EquilibriumBC(rho=1.0, u=(u_in, 0.0, 0.0), indices=box_ne["left"])],
    }

    def initializer(fs):
        out = []
        for f in fs:
            shape = f.shape[1:]
            rho = jnp.ones((1,) + shape, dtype=jnp.float32)
            u = jnp.zeros((3,) + shape, dtype=jnp.float32).at[0].set(u_in)
            out.append(quadratic_equilibrium(rho, u, vs._c, vs._w, jnp.float32).astype(f.dtype))
        return out

    omega = 1.0 / (3.0 * (u_in * 2 * radius_f / re) + 0.5)
    sim = MultiresSimulationManager(grid, omega_finest=omega, boundary_conditions=bcs, initializer=initializer)
    sim.run(coarse_steps)

    (rho_f, u_f), (rho_c, u_c) = sim.export_macroscopic()
    print(f"fine level: max|u|={np.abs(u_f).max():.4f}, finite={np.isfinite(u_f).all()}")
    print(f"coarse level: max|u|={np.abs(u_c).max():.4f}, wake deficit at fine-box exit: "
          f"{u_c[0, (fine.origin_in_parent[0] + fine.extent_in_parent[0]) % coarse.shape[0], coarse.shape[1] // 2, coarse.shape[2] // 2]:.4f} vs inflow {u_in}")
    if export:
        MultiresIO(grid, output_dir=".").export_macroscopic(sim, timestep=coarse_steps)
    return u_f, u_c


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    args = p.parse_args()
    run(coarse_steps=args.steps)
