"""Shan-Chen multiphase: static droplet + Laplace law sweep.

BEYOND-REFERENCE example (the reference has no multiphase capability):
liquid droplets of several radii relax in vapor at G = -5; the pressure
jump dp across the interface follows Laplace's law dp = sigma / R in 2-D,
so dp vs 1/R is a line through the origin whose slope is the surface
tension.  Also reports the coexistence densities and the spurious-current
level (the standard quality metrics for a multiphase LBM).

Runs on either tier: `--backend pallas` routes the per-voxel interaction
force through the fused kernel's aux channels.
"""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))  # allow running as a script

import argparse

import numpy as np

import xlb_tpu as xlb
from xlb_tpu.velocity_set import D2Q9
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper, ShanChenMultiphaseStepper


def run(n=96, radii=(10.0, 14.0, 18.0), G=-5.0, num_steps=1200, backend="jax"):
    import jax.numpy as jnp

    xlb.init(
        velocity_set=D2Q9(),
        default_backend=xlb.ComputeBackend.PALLAS if backend == "pallas" else xlb.ComputeBackend.JAX,
        default_precision_policy=xlb.PrecisionPolicy.FP32FP32,
    )
    results = []
    for radius in radii:
        grid = grid_factory((n, n))
        nse = IncompressibleNavierStokesStepper(grid, boundary_conditions=())
        sc = ShanChenMultiphaseStepper(nse, G=G)
        x = np.arange(n) - n / 2 + 0.5
        xx, yy = np.meshgrid(x, x, indexing="ij")
        r = np.sqrt(xx**2 + yy**2)
        rho0 = 0.16 + 0.5 * (1.9 - 0.16) * (1.0 - np.tanh((r - radius) / 2.0))
        w = np.asarray(nse.velocity_set._w, np.float32).reshape(-1, 1, 1)
        f0 = jnp.asarray(w * rho0[None])
        f1 = jnp.zeros_like(f0)
        _, _, bm, mm = nse.prepare_fields()
        window = sc.build_multi_step(num_steps)
        f0, f1 = window(f0, f1, bm, mm, 1.0)

        rho, u_true = sc.macroscopic(f0)
        p = np.asarray(sc.pressure(rho))[0]
        rho_np = np.asarray(rho[0])
        dp = float(p[n // 2, n // 2] - p[2, 2])
        # measured radius from the liquid area (rho above the mean of the phases)
        area = float((rho_np > 0.5 * (rho_np.max() + rho_np.min())).sum())
        r_meas = float(np.sqrt(area / np.pi))
        umax = float(jnp.abs(u_true).max())
        results.append((r_meas, dp, umax, float(rho_np.min()), float(rho_np.max())))
        print(f"R={r_meas:6.2f}  dp={dp:.5f}  |u|max={umax:.4f}  rho=[{rho_np.min():.3f}, {rho_np.max():.3f}]")

    # Laplace fit: dp = sigma / R (through the origin)
    inv_r = np.array([1.0 / r for r, *_ in results])
    dps = np.array([dp for _, dp, *_ in results])
    sigma = float((inv_r @ dps) / (inv_r @ inv_r))
    resid = float(np.abs(dps - sigma * inv_r).max() / dps.max())
    print(f"surface tension sigma = {sigma:.5f} (Laplace fit residual {resid:.1%})")
    return sigma, resid, results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--backend", default="jax", choices=("jax", "pallas"))
    args = ap.parse_args()
    run(n=args.n, num_steps=args.steps, backend=args.backend)
