"""Immersed-boundary wind turbine with a rotating rotor
(reference examples/ibm/wind_turbine_ibm.py:160-200).

The rotor geometry is procedural (no STL download needed).  Unlike the
reference -- which mutates marker arrays between kernel launches -- the
rotation is closed-form inside the jitted window: marker positions and
velocities at step t are R(omega_r t) applied to the initial markers, so
an entire window of moving-geometry steps is ONE device dispatch.

Reports rotor torque about the axis and axial thrust from the Lagrangian
marker forces."""

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
from xlb_tpu.helper.ibm_helper import prepare_immersed_boundary
from xlb_tpu.helper.initializers import initialize_from_macroscopic
from xlb_tpu.geometry import turbine_rotor_triangles
from xlb_tpu.ops import Macroscopic
from xlb_tpu.utils import omega_from_reynolds


def run(nx=96, nyz=48, re=500.0, u_in=0.04, tip_speed_ratio=3.0, num_steps=300, window=50,
        backend="jax"):
    xlb.init(velocity_set=D3Q19(),
             default_backend=xlb.ComputeBackend.PALLAS if backend == "pallas" else xlb.ComputeBackend.JAX,
             default_precision_policy=xlb.PrecisionPolicy.FP32FP32)
    grid = grid_factory((nx, nyz, nyz))
    vs = xlb.DefaultConfig.velocity_set

    radius = nyz / 4
    center = np.array([nx / 3, nyz / 2, nyz / 2])
    tris = turbine_rotor_triangles(center=center, radius=radius, hub_radius=radius / 6, axis="x")
    vertices, areas, _ = prepare_immersed_boundary(tris, max_lagrangian_spacing=0.8)
    rot_speed = tip_speed_ratio * u_in / radius  # rad per step
    print(f"turbine: {len(vertices)} markers, R={radius:.0f}, rotor speed {rot_speed:.4f} rad/step")

    # window = the rotor's SWEPT volume: thin in x, the full disc in y/z
    rotor_w = int(2 * radius) + 12
    stepper = IBMStepper(grid, ibm_max_iterations=4, ibm_window=(16, rotor_w, rotor_w))
    f_0, f_1, bc_mask, missing_mask = stepper.prepare_fields()
    u0 = np.zeros((3, nx, nyz, nyz), dtype=np.float32)
    u0[0] = u_in
    f_0 = initialize_from_macroscopic(grid, vs, stepper.precision_policy, np.ones((1, nx, nyz, nyz), np.float32), u0)

    v0 = jnp.asarray(vertices)
    a = jnp.asarray(areas)
    c = jnp.asarray(center, dtype=v0.dtype)
    omega = omega_from_reynolds(re, u_in, 2 * radius)

    def markers_at(t):
        """Rigid rotation about the +x axis through the center: positions
        AND the matching tangential velocities (the reference's
        rotate_rotor kernel, wind_turbine_ibm.py:160-200)."""
        theta = rot_speed * t.astype(v0.dtype)
        rel = v0 - c
        cth, sth = jnp.cos(theta), jnp.sin(theta)
        y = cth * rel[:, 1] - sth * rel[:, 2]
        z = sth * rel[:, 1] + cth * rel[:, 2]
        pos = jnp.stack([v0[:, 0], y + c[1], z + c[2]], axis=1)
        vel = jnp.stack([jnp.zeros_like(y), -rot_speed * z, rot_speed * y], axis=1)
        return pos, vel

    @jax.jit
    def run_window(f_0, f_1, start):
        def body(t, carry):
            f_0, f_1, _, _ = carry
            pos, vel = markers_at(start + t)
            f_0, f_1, forces = stepper(f_0, f_1, pos, a, vel, bc_mask, missing_mask, omega, start + t)
            return (f_1, f_0, forces, pos)

        return jax.lax.fori_loop(0, window, body, (f_0, f_1, jnp.zeros_like(v0), v0))

    torque_history, thrust_history = [], []
    for start in range(0, num_steps, window):
        f_0, f_1, forces, pos = run_window(f_0, f_1, jnp.asarray(start))
        body_f = -(forces * a[:, None])  # per-marker force ON the rotor
        rel = pos - c
        # torque about +x: r x F restricted to the rotor plane
        tq = float(jnp.sum(rel[:, 1] * body_f[:, 2] - rel[:, 2] * body_f[:, 1]))
        th = float(jnp.sum(body_f[:, 0]))
        torque_history.append(tq)
        thrust_history.append(th)
        print(f"step {start + window}: torque={tq:+.4e} thrust={th:+.4e}")

    _, u = Macroscopic()(f_0)
    print(f"turbine: finite={bool(jnp.isfinite(u).all())}, max|u|={float(jnp.abs(u).max()):.4f}")
    return torque_history, thrust_history


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--tsr", type=float, default=3.0)
    p.add_argument("--backend", choices=["jax", "pallas"], default="jax",
                   help="pallas routes the NSE part of each IBM step through the fused kernel")
    args = p.parse_args()
    run(num_steps=args.steps, tip_speed_ratio=args.tsr, backend=args.backend)
