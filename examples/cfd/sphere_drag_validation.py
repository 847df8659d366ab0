"""Quantitative 3D sphere drag validation (Re 100-300) on a REAL, broken STL.

The missing quantitative leg of the 3D force path (round-3 VERDICT #3/#4):
a wind tunnel over the checked-in NON-WATERTIGHT sphere asset
(data/sphere_nonwatertight.stl: open holes, duplicated faces, flipped
normals), voxelized with the WINDING method -- the exact pathology the
reference built winding.py:20 for, exercised here end-to-end -- with the
HybridBC curved wall (per-link ray distances; links that escape through a
hole fall back to the halfway value) and drag through the
momentum-exchange method (ops/force.py::MomentumTransfer, reference
momentum_transfer.py:121-212).

Published steady-axisymmetric sphere drag (Johnson & Patel 1999 JFM;
Clift-Grace-Weber correlation):

    Re=100: Cd ~ 1.087      Re=200: Cd ~ 0.772      Re=300: Cd ~ 0.657*
    (*Re=300 is marginally unsteady; mean value)

Tunnel: (12D, 6D, 6D), sphere centered at 3.5D from the inlet; FreeSlipBC
lateral walls approximate the unbounded flow (blockage (pi/4)(1/6)^2 ~ 2%,
which biases Cd up ~ +2% per standard corrections -- kept, not corrected,
and covered by the assertion band).  RegularizedBC velocity inlet +
RegularizedBC pressure (rho=1) outlet, BGK.

The outlet choice is load-bearing: a zero-gradient ExtrapolationOutflow
outlet conserves whatever mass the impulsive start traps in the domain
(measured: rho settles ~1.048 everywhere), and an EquilibriumBC inlet
(f=feq(1, u_in)) then under-delivers flux against the elevated interior
density -- the realized mean velocity was 0.65 u_in, i.e. Re 65 in a run
normalized as Re 100, reading as a spurious -36% Cd.  The pressure outlet
anchors rho=1 so the velocity inlet actually delivers u_in; this matches
the (quantitatively validated) Schafer-Turek 2D setup.

Asserted in-suite by tests/models/test_sphere_drag.py (real-chip tier).
Measured on one TPU v5e at D=24, Re=100: Cd = 1.155 (+6.3% vs published
1.087, inside the +/-8% band expected at this resolution/blockage; the
phase-sampled acoustic peak-to-peak spread is ~0.013).

Run: python examples/cfd/sphere_drag_validation.py [--d 24] [--re 100]
"""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))

import argparse
import pathlib

import numpy as np

import xlb_tpu as xlb
from xlb_tpu.velocity_set import D3Q19
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.boundary import FreeSlipBC, HybridBC, RegularizedBC
from xlb_tpu.geometry import load_stl, transform_mesh
from xlb_tpu.geometry.voxelize import MeshVoxelizationMethod
from xlb_tpu.ops import MomentumTransfer

ASSET = pathlib.Path(__file__).parent / "data" / "sphere_nonwatertight.stl"


def run(d=24, re=100.0, u_in=0.05, t_star=60.0, backend="auto", sphere_bc="hybrid", verbose=True):
    """Returns the mean Cd over the trailing 15% of the run.

    ``sphere_bc``: "hybrid" (curved wall, per-link ray distances) or
    "staircase" (plain halfway bounce-back on the voxelized shell) --
    the latter isolates the curved-wall correction for convergence studies.
    """
    import jax
    import jax.numpy as jnp

    xlb.init(velocity_set=D3Q19(), default_backend=xlb.ComputeBackend.JAX,
             default_precision_policy=xlb.PrecisionPolicy.FP32FP32)

    nx, nyz = 12 * d, 6 * d
    grid = grid_factory((nx, nyz, nyz), mesh_shape=(1, 1, 1), devices=jax.devices()[:1])
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)

    # the asset is a unit sphere at the origin: scale to diameter d voxels
    tris = load_stl(str(ASSET))
    center = np.array([3.5 * d, nyz / 2.0, nyz / 2.0])
    tris = transform_mesh(tris, scale=d / 2.0, translation=center)

    if sphere_bc == "staircase":
        from xlb_tpu.boundary import HalfwayBounceBackBC

        bc_sphere = HalfwayBounceBackBC(
            mesh_vertices=tris, voxelization_method=MeshVoxelizationMethod.WINDING,
        )
    else:
        bc_sphere = HybridBC(
            bc_method="bounceback", mesh_vertices=tris,
            voxelization_method=MeshVoxelizationMethod.WINDING,
        )
    # lateral free-slip walls, one BC per outward normal (each voxel claimed
    # once: the y faces own the y-z edge lines, the z faces are y-trimmed)
    g = np.indices((nx, nyz, nyz))
    front = g[:, :, 0, :].reshape(3, -1)
    back = g[:, :, nyz - 1, :].reshape(3, -1)
    bottom = g[:, :, 1 : nyz - 1, 0].reshape(3, -1)
    top = g[:, :, 1 : nyz - 1, nyz - 1].reshape(3, -1)
    bcs = [
        FreeSlipBC(indices=front.tolist(), normal=(0, -1, 0)),
        FreeSlipBC(indices=back.tolist(), normal=(0, 1, 0)),
        FreeSlipBC(indices=bottom.tolist(), normal=(0, 0, -1)),
        FreeSlipBC(indices=top.tolist(), normal=(0, 0, 1)),
        RegularizedBC("velocity", prescribed_value=(u_in, 0.0, 0.0), indices=box_ne["left"]),
        RegularizedBC("pressure", prescribed_value=1.0, indices=box_ne["right"]),
        bc_sphere,
    ]
    stepper = IncompressibleNavierStokesStepper(grid, boundary_conditions=bcs)
    from xlb_tpu.helper.initializers import CustomInitializer

    f_0, f_1, bc_mask, missing_mask = stepper.prepare_fields(
        initializer=CustomInitializer(rho_0=1.0, u_0=(u_in, 0.0, 0.0))
    )
    mt = MomentumTransfer(bc_sphere)

    nu = u_in * d / re
    omega = 1.0 / (3.0 * nu + 0.5)
    num_steps = int(t_star * d / u_in)
    window = max(num_steps // 40, 1)

    use_fused = backend == "pallas" or (backend == "auto" and jax.default_backend() != "cpu")
    if use_fused:
        from xlb_tpu.kernels.fused_step import build_fused_window

        run_window = build_fused_window(stepper, window)
    else:
        run_window = stepper.build_multi_step(window, donate=False)

    area = np.pi * (d / 2.0) ** 2
    coef = 1.0 / (0.5 * u_in**2 * area)
    for start in range(0, num_steps, window):
        f_0, f_1 = run_window(f_0, f_1, bc_mask, missing_mask, omega)
        if verbose and ((start // window) % 8 == 7):
            force = np.asarray(mt(f_0, f_1, bc_mask, missing_mask))
            print(f"t* = {(start + window) * u_in / d:6.1f}:  Cd = {coef * force[0]:.4f}")

    # measurement: the velocity-anchored inlet + pressure-anchored outlet
    # form a weakly damped acoustic resonator (damping time ~1/(nu k^2) >>
    # any affordable run), so the instantaneous force rides a standing-wave
    # oscillation of several percent (period ~ 2 L / c_s).  Keep stepping
    # with the SAME already-compiled window (one window = ``window/period``
    # of a period, an irrational-ish fraction, so successive samples walk
    # the oscillation phase near-uniformly) and average the sampled force.
    # Phase-equidistributed sampling converges like 1/N and sidesteps the
    # ~1000-step jnp-scan measurement dispatch that proved fragile through
    # the tunnel (two worker crashes in two sessions at exactly that phase).
    period = 2.0 * nx * np.sqrt(3.0)
    n_samples = max(int(np.ceil(12.0 * period / window)), 16)
    samples = []
    for _ in range(n_samples):
        f_0, f_1 = run_window(f_0, f_1, bc_mask, missing_mask, omega)
        force = np.asarray(mt(f_0, f_1, bc_mask, missing_mask))
        samples.append(coef * float(force[0]))
    cds = np.asarray(samples)
    cd_mean = float(cds.mean())
    cd_osc = float(cds.max() - cds.min())
    if verbose:
        ref = {100.0: 1.087, 200.0: 0.772, 300.0: 0.657}.get(re)
        line = (f"sphere drag (D={d}, Re={re}, winding-voxelized broken STL): "
                f"Cd = {cd_mean:.4f} (acoustic p-p {cd_osc:.4f} over {n_samples * window} steps)")
        if ref:
            line += f"   (published ~{ref}, dev {100 * (cd_mean / ref - 1):+.1f}%)"
        print(line)
    return cd_mean


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--d", type=int, default=24, help="sphere diameter in lattice units")
    p.add_argument("--re", type=float, default=100.0)
    p.add_argument("--u-in", type=float, default=0.05)
    p.add_argument("--t-star", type=float, default=60.0)
    p.add_argument("--backend", choices=["auto", "jax", "pallas"], default="auto")
    p.add_argument("--sphere-bc", choices=["hybrid", "staircase"], default="hybrid")
    args = p.parse_args()
    run(d=args.d, re=args.re, u_in=args.u_in, t_star=args.t_star, backend=args.backend,
        sphere_bc=args.sphere_bc)
