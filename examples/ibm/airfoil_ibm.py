"""Immersed-boundary flow over a NACA airfoil at angle of attack
(reference examples/ibm/airfoil_ibm.py, which loads an STL; here the
airfoil surface is generated procedurally so no asset is needed).

Reports lift/drag from the Lagrangian marker forces: the momentum the IBM
imparts to the fluid per step is minus the force on the body."""

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
from xlb_tpu.geometry import naca_airfoil_triangles
from xlb_tpu.ops import Macroscopic
from xlb_tpu.utils import omega_from_reynolds


def run(nx=96, ny=32, nz=48, re=500.0, u_in=0.04, aoa_deg=10.0, num_steps=300, naca="0012"):
    xlb.init(velocity_set=D3Q19(), default_backend=xlb.ComputeBackend.JAX,
             default_precision_policy=xlb.PrecisionPolicy.FP32FP32)
    grid = grid_factory((nx, ny, nz))
    vs = xlb.DefaultConfig.velocity_set

    chord = nz * 0.6
    span = ny * 0.5
    tris = naca_airfoil_triangles(
        chord=chord, span=span, naca=naca, angle_of_attack_deg=aoa_deg,
        leading_edge=(nx / 3, (ny - span) / 2, nz / 2),
    )
    vertices, areas, velocities = prepare_immersed_boundary(tris, max_lagrangian_spacing=0.8)
    print(f"NACA{naca} @ {aoa_deg} deg: {len(vertices)} markers, chord {chord:.0f}, span {span:.0f}")

    stepper = IBMStepper(grid, ibm_max_iterations=4, ibm_window=marker_window(vertices))
    f_0, f_1, bc_mask, missing_mask = stepper.prepare_fields()
    u0 = np.zeros((3, nx, ny, nz), dtype=np.float32)
    u0[0] = u_in
    f_0 = initialize_from_macroscopic(grid, vs, stepper.precision_policy, np.ones((1, nx, ny, nz), np.float32), u0)

    v, a, uw = jnp.asarray(vertices), jnp.asarray(areas), jnp.asarray(velocities)
    omega = omega_from_reynolds(re, u_in, chord)

    @jax.jit
    def window(f_0, f_1, n):
        def body(t, carry):
            f_0, f_1, _ = carry
            f_0, f_1, forces = stepper(f_0, f_1, v, a, uw, bc_mask, missing_mask, omega, t)
            return (f_1, f_0, forces)

        return jax.lax.fori_loop(0, n, body, (f_0, f_1, jnp.zeros_like(v)))

    f_0, f_1, forces = window(f_0, f_1, num_steps)
    body_force = -np.asarray(jnp.sum(forces * a[:, None], axis=0))  # force on the body
    q = 0.5 * u_in**2 * chord * span
    cd, cl = body_force[0] / q, body_force[2] / q
    _, u = Macroscopic()(f_0)
    print(f"airfoil: Cd={cd:.3f} Cl={cl:.3f} (L/D={cl / max(cd, 1e-9):.2f}), "
          f"max|u|={float(jnp.abs(u).max()):.4f}, finite={bool(jnp.isfinite(u).all())}")
    return cd, cl


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--aoa", type=float, default=10.0)
    p.add_argument("--naca", type=str, default="0012")
    args = p.parse_args()
    run(num_steps=args.steps, aoa_deg=args.aoa, naca=args.naca)
