"""2D Rayleigh-Benard convection: Boussinesq-coupled NSE + advection-
diffusion (xlb_tpu/models/ade.py -- an upgrade over the reference, whose
PhysicsType.ADE is an empty placeholder).

A fluid layer heated from below (Dirichlet phi=1) and cooled from above
(phi=0) with no-slip walls and periodic sides.  Above the critical
Rayleigh number (~1708) the conductive state destabilizes into convection
rolls; the Nusselt number (total/conductive heat flux) rises above 1.
"""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))  # allow running as a script

import argparse

import numpy as np
import jax.numpy as jnp

import xlb_tpu as xlb
from xlb_tpu.velocity_set import D2Q9
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import (
    IncompressibleNavierStokesStepper,
    AdvectionDiffusionStepper,
    ThermalNSEStepper,
    omega_from_diffusivity,
)
from xlb_tpu.boundary import EquilibriumBC, HalfwayBounceBackBC
from xlb_tpu.ops import Macroscopic


def run(nx=128, ny=64, rayleigh=5e4, prandtl=0.71, num_steps=4000, window=500, beta=5e-4,
        backend="jax", obstacle=False):
    xlb.init(velocity_set=D2Q9(), default_backend=xlb.ComputeBackend.JAX,
             default_precision_policy=xlb.PrecisionPolicy.FP32FP32)
    grid = grid_factory((nx, ny))
    box = grid.bounding_box_indices()

    # lattice parameters from (Ra, Pr): Ra = beta*g*dT*L^3/(nu*D), Pr = nu/D
    L, dT, g_mag = ny - 2, 1.0, 1.0
    nu = np.sqrt(prandtl * beta * g_mag * dT * L**3 / rayleigh)
    D = nu / prandtl
    omega = 1.0 / (3.0 * nu + 0.5)
    omega_phi = omega_from_diffusivity(D)
    print(f"Ra={rayleigh:.0f} Pr={prandtl}: nu={nu:.4f} (omega={omega:.3f}), D={D:.4f} (omega_phi={omega_phi:.3f})")

    be = xlb.ComputeBackend.PALLAS if backend == "pallas" else None
    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in ("bottom", "top")], axis=1), axis=1)
    nse_bcs = [HalfwayBounceBackBC(indices=walls.tolist())]
    ade_bcs = [
        EquilibriumBC(rho=1.0, u=(0.0, 0.0), indices=box["bottom"]),  # hot floor
        EquilibriumBC(rho=0.0, u=(0.0, 0.0), indices=box["top"]),     # cold ceiling
    ]
    if obstacle:
        # curved adiabatic cylinder in the cavity center: no-slip for the
        # flow, pure reflection (zero flux) for the scalar -- exercises the
        # fused thermal path with curved geometry (buoyancy + spatial BCs
        # compose in-kernel; kernels/fused_step.build_fused_forced_step)
        r = ny / 8
        ii, jj = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
        circ = (ii - nx / 2) ** 2 + (jj - ny / 2) ** 2 <= r**2
        circ_idx = np.stack(np.nonzero(circ))
        nse_bcs.append(HalfwayBounceBackBC(indices=circ_idx.tolist()))
        ade_bcs.append(HalfwayBounceBackBC(indices=circ_idx.tolist()))
    nse = IncompressibleNavierStokesStepper(grid, boundary_conditions=nse_bcs, compute_backend=be)
    ade = AdvectionDiffusionStepper(grid, boundary_conditions=ade_bcs, compute_backend=be)
    thermal = ThermalNSEStepper(nse, ade, beta=beta, gravity=(0.0, -g_mag))

    f0, f1, bcf, mf = nse.prepare_fields()
    yy = np.broadcast_to((np.arange(ny) / (ny - 1.0))[None, :], (nx, ny))
    xx = np.broadcast_to((np.arange(nx) / nx)[:, None], (nx, ny))
    phi0 = (1.0 - yy) + 0.01 * np.sin(2 * np.pi * 3 * xx) * np.sin(np.pi * yy)
    g0, g1, bcg, mg = ade.prepare_fields(phi_init=phi0.astype(np.float32))

    step_window = thermal.build_multi_step(window)
    nusselts = []
    mac = Macroscopic()
    for start in range(0, num_steps, window):
        f0, f1, g0, g1 = step_window(f0, f1, g0, g1, bcf, mf, bcg, mg, omega, omega_phi, start)
        rho, u = mac(f0)
        phi = ade.phi(g0)[0]
        uy = np.asarray(u[1])
        phi_np = np.asarray(phi)
        # Nusselt: 1 + <uy * phi> / (D * dT / L) averaged over the interior
        conv = float((uy[:, 1:-1] * phi_np[:, 1:-1]).mean())
        nu_number = 1.0 + conv / (D * dT / L)
        nusselts.append(nu_number)
        print(f"  step {start + window}: max|u|={np.abs(np.asarray(u)).max():.4f}  Nu={nu_number:.3f}")
        assert np.isfinite(uy).all(), "velocity field blew up"
    return np.asarray(nusselts)


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--nx", type=int, default=128)
    p.add_argument("--ny", type=int, default=64)
    p.add_argument("--ra", type=float, default=5e4)
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--backend", choices=["jax", "pallas"], default="jax")
    p.add_argument("--obstacle", action="store_true",
                   help="adiabatic cylinder in the cavity (curved geometry on the fused thermal path)")
    a = p.parse_args()
    run(nx=a.nx, ny=a.ny, rayleigh=a.ra, num_steps=a.steps, backend=a.backend, obstacle=a.obstacle)
