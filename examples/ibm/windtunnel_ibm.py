"""IBM wind tunnel: an immersed body in a tunnel with real inlet/outlet
and wall boundary conditions (reference examples/ibm/windtunnel_ibm.py).

Combines the lattice BC zoo (equilibrium inlet, extrapolation outflow,
bounce-back walls) with Lagrangian-marker forcing for the body -- the
marker surface needs no voxelization, so the same script takes any STL.
Reports drag/lift from the marker forces."""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))  # allow running as a script

import argparse

import numpy as np
import jax
import jax.numpy as jnp

import xlb_tpu as xlb
from xlb_tpu.velocity_set import D3Q19
from xlb_tpu.grid import grid_factory
from xlb_tpu.models.ibm import IBMStepper
from xlb_tpu.helper.ibm_helper import prepare_immersed_boundary, marker_window
from xlb_tpu.helper.initializers import initialize_from_macroscopic
from xlb_tpu.geometry import load_stl, sphere_triangles, transform_mesh
from xlb_tpu.boundary import EquilibriumBC, ExtrapolationOutflowBC, FullwayBounceBackBC
from xlb_tpu.ops import Macroscopic
from xlb_tpu.utils import omega_from_reynolds


def run(nx=96, nyz=48, re=200.0, u_in=0.04, num_steps=300, stl=None):
    xlb.init(velocity_set=D3Q19(), default_backend=xlb.ComputeBackend.JAX,
             default_precision_policy=xlb.PrecisionPolicy.FP32FP32)
    grid = grid_factory((nx, nyz, nyz))
    vs = xlb.DefaultConfig.velocity_set

    if stl:
        tris = load_stl(stl)
        lo, hi = tris.min(axis=(0, 1)), tris.max(axis=(0, 1))
        scale = (nyz / 3.0) / max(hi - lo)
        center = np.array([nx / 3, nyz / 2, nyz / 2])
        tris = transform_mesh(tris, scale=scale, translation=center - scale * (lo + hi) / 2)
        size = float(max(hi - lo)) * scale
    else:
        size = nyz / 3
        tris = sphere_triangles(center=(nx / 3, nyz / 2, nyz / 2), radius=size / 2, subdivisions=3)
    vertices, areas, velocities = prepare_immersed_boundary(tris, max_lagrangian_spacing=0.8)

    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)
    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in ("bottom", "top", "front", "back")], axis=1), axis=1)
    bcs = [
        FullwayBounceBackBC(indices=walls.tolist()),
        EquilibriumBC(rho=1.0, u=(u_in, 0.0, 0.0), indices=box_ne["left"]),
        ExtrapolationOutflowBC(indices=box_ne["right"]),
    ]
    stepper = IBMStepper(grid, boundary_conditions=bcs, ibm_max_iterations=4,
                         ibm_window=marker_window(vertices))
    f_0, f_1, bc_mask, missing_mask = stepper.prepare_fields()
    u0 = np.zeros((3, nx, nyz, nyz), dtype=np.float32)
    u0[0] = u_in
    f_0 = initialize_from_macroscopic(grid, vs, stepper.precision_policy, np.ones((1, nx, nyz, nyz), np.float32), u0)

    v, a, uw = jnp.asarray(vertices), jnp.asarray(areas), jnp.asarray(velocities)
    omega = omega_from_reynolds(re, u_in, size)
    print(f"IBM windtunnel: {len(vertices)} markers, body size {size:.0f}, omega={omega:.3f}")

    @jax.jit
    def window(f_0, f_1, n):
        def body(t, carry):
            f_0, f_1, _ = carry
            f_0, f_1, forces = stepper(f_0, f_1, v, a, uw, bc_mask, missing_mask, omega, t)
            return (f_1, f_0, forces)

        return jax.lax.fori_loop(0, n, body, (f_0, f_1, jnp.zeros_like(v)))

    f_0, f_1, forces = window(f_0, f_1, num_steps)
    body_force = -np.asarray(jnp.sum(forces * a[:, None], axis=0))
    q = 0.5 * u_in**2 * np.pi * (size / 2) ** 2
    _, u = Macroscopic()(f_0)
    print(f"IBM windtunnel: Cd={body_force[0] / q:.3f} Cl={body_force[2] / q:+.3f}, "
          f"max|u|={float(jnp.abs(u).max()):.4f}, finite={bool(jnp.isfinite(u).all())}")
    return body_force[0] / q


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--stl", type=str, default=None)
    args = p.parse_args()
    run(num_steps=args.steps, stl=args.stl)
