"""Flow past an immersed sphere via the IBM stepper
(reference examples/ibm/flow_past_sphere.py).

Uniform inflow over a sphere represented by Lagrangian markers; reports the
no-slip residual at the markers and the integrated IBM drag force
(F_drag = -sum_k rho A_k F_k per step at steady state).
"""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))  # allow running as a script

import argparse

import numpy as np
import jax.numpy as jnp

import xlb_tpu as xlb
from xlb_tpu.velocity_set import D3Q19
from xlb_tpu.grid import grid_factory
from xlb_tpu.models.ibm import IBMStepper, interpolate_from_grid
from xlb_tpu.helper.ibm_helper import prepare_immersed_boundary, marker_window
from xlb_tpu.helper.initializers import initialize_from_macroscopic
from xlb_tpu.geometry import sphere_triangles
from xlb_tpu.ops import Macroscopic
from xlb_tpu.utils import omega_from_reynolds, save_usd_points


def run(nx=64, nyz=32, re=100.0, u_in=0.03, num_steps=200, usd=None, backend="jax"):
    xlb.init(velocity_set=D3Q19(),
             default_backend=xlb.ComputeBackend.PALLAS if backend == "pallas" else xlb.ComputeBackend.JAX,
             default_precision_policy=xlb.PrecisionPolicy.FP32FP32)
    grid = grid_factory((nx, nyz, nyz))
    vs = xlb.DefaultConfig.velocity_set

    radius = nyz / 6
    tris = sphere_triangles(center=(nx / 3, nyz / 2, nyz / 2), radius=radius, subdivisions=3)
    vertices, areas, velocities = prepare_immersed_boundary(tris, max_lagrangian_spacing=0.8)
    print(f"{len(vertices)} Lagrangian markers, total area {areas.sum():.1f} "
          f"(sphere area {4 * np.pi * radius**2:.1f})")

    stepper = IBMStepper(grid, ibm_max_iterations=4, ibm_window=marker_window(vertices))
    f_0, f_1, bc_mask, missing_mask = stepper.prepare_fields()

    u0 = np.zeros((3, nx, nyz, nyz), dtype=np.float32)
    u0[0] = u_in
    rho0 = np.ones((1, nx, nyz, nyz), dtype=np.float32)
    f_0 = initialize_from_macroscopic(grid, vs, stepper.precision_policy, rho0, u0)

    v = jnp.asarray(vertices)
    a = jnp.asarray(areas)
    uw = jnp.asarray(velocities)
    omega = omega_from_reynolds(re, u_in, 2 * radius)

    import jax

    @jax.jit
    def window(f_0, f_1, n):
        def body(t, carry):
            f_0, f_1, _ = carry
            f_0, f_1, forces = stepper(f_0, f_1, v, a, uw, bc_mask, missing_mask, omega, t)
            return (f_1, f_0, forces)

        return jax.lax.fori_loop(0, n, body, (f_0, f_1, jnp.zeros_like(v)))

    f_0, f_1, forces = window(f_0, f_1, num_steps)

    _, u = Macroscopic()(f_0)
    u_flat = u.reshape(3, -1).T
    u_markers = np.asarray(interpolate_from_grid(u_flat, v, grid.shape))
    residual = np.linalg.norm(u_markers, axis=1).mean()
    # momentum imparted to the fluid per step ~ -drag on the body
    drag = -float(jnp.sum(forces[:, 0] * a))
    area_ref = np.pi * radius**2
    cd = drag / (0.5 * u_in**2 * area_ref)
    print(f"IBM sphere: marker-slip residual {residual:.2e} ({residual / u_in:.1%} of U), "
          f"drag force {drag:+.4e}, Cd~{cd:.2f}, max|u|={float(jnp.abs(u).max()):.4f}")

    if usd:
        save_usd_points(usd, vertices, np.linalg.norm(np.asarray(forces), axis=1))
        print(f"wrote Lagrangian markers to {usd}")
    return residual


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--usd", type=str, default=None)
    p.add_argument("--backend", choices=["jax", "pallas"], default="jax",
                   help="pallas routes the NSE part of each IBM step through the fused kernel")
    args = p.parse_args()
    run(num_steps=args.steps, usd=args.usd, backend=args.backend)
