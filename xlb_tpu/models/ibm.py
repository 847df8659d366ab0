"""Immersed-boundary-method stepper (multi-direct forcing).

TPU-native counterpart of the reference IBMStepper
(xlb/operator/stepper/ibm_stepper.py:14-476, Warp-only there).  The same
velocity-based partition-of-unity formulation is used:

    target_u[i]   = sum_k w_ik A_k F_k / sum_k w_ik      (spread)
    correction[i] = relax * (target_u[i] - u[i])
    F_k          += U_solid_k - u_interp(X_k)            (marker update)

with the Peskin 4-point regularized delta as w.  Design differences for TPU:

- marker->grid spreading is a deterministic XLA ``scatter-add`` over each
  marker's static 4x4x4 stencil (no atomics, no hash grid: the stencil
  neighborhood is known analytically from floor(X_k)),
- grid->marker interpolation is the matching gather,
- the fixed-point loop runs a static ``ibm_iterations`` count inside jit
  (a residual-based early exit would force a host sync per iteration --
  the reference needs pinned-memory tricks for exactly this reason,
  ibm_stepper.py:379-420),
- each iteration re-interpolates from the *corrected* velocity field, the
  standard multi-direct-forcing refinement (Inamuro 2012), so iterations
  actually tighten the no-slip constraint.

The whole step (NSE + IBM loop + population correction) is one jittable,
differentiable function.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from xlb_tpu.models.nse import IncompressibleNavierStokesStepper
from xlb_tpu.ops.macroscopic import Macroscopic
from xlb_tpu.ops.equilibrium import quadratic_equilibrium


def peskin_weight(r):
    """Peskin's 4-point regularized delta function (reference
    ibm_stepper.py:156-174)."""
    abs_r = jnp.abs(r)
    inner = 0.125 * (3.0 - 2.0 * abs_r + jnp.sqrt(jnp.maximum(1.0 + 4.0 * abs_r - 4.0 * abs_r**2, 0.0)))
    outer = 0.125 * (5.0 - 2.0 * abs_r - jnp.sqrt(jnp.maximum(-7.0 + 12.0 * abs_r - 4.0 * abs_r**2, 0.0)))
    return jnp.where(abs_r <= 1.0, inner, jnp.where(abs_r <= 2.0, outer, 0.0))


def _marker_stencil(positions, shape):
    """Per-marker 4^3 stencil: linear cell ids (n, 64) and Peskin weights
    (n, 64).  Cell centers sit at integer coordinates (voxel units)."""
    n = positions.shape[0]
    base = jnp.floor(positions).astype(jnp.int32) - 1  # (n, 3)
    offs = jnp.stack(jnp.meshgrid(*[jnp.arange(4)] * 3, indexing="ij"), axis=-1).reshape(-1, 3)  # (64, 3)
    cells = base[:, None, :] + offs[None, :, :]  # (n, 64, 3)
    dims = jnp.asarray(shape, dtype=jnp.int32)
    # stencil cells outside the domain contribute NOTHING: zero their
    # weights (a wrap here would silently couple a near-edge marker to the
    # opposite face) and clamp the ids only so indexing stays in range
    in_domain = jnp.all((cells >= 0) & (cells < dims[None, None, :]), axis=-1)  # (n, 64)
    cells_c = jnp.clip(cells, 0, dims[None, None, :] - 1)
    r = cells.astype(positions.dtype) - positions[:, None, :]
    w = peskin_weight(r[..., 0]) * peskin_weight(r[..., 1]) * peskin_weight(r[..., 2])  # (n, 64)
    w = jnp.where(in_domain, w, 0.0)
    lin = (cells_c[..., 0] * dims[1] + cells_c[..., 1]) * dims[2] + cells_c[..., 2]  # (n, 64)
    return lin, w


def spread_to_grid(values, positions, areas, shape):
    """sum_k w_ik A_k value_k  and  sum_k w_ik, as flat (ncells, c) arrays."""
    lin, w = _marker_stencil(positions, shape)
    ncells = int(np.prod(shape))
    wa = w * areas[:, None]  # (n, 64)
    num = jnp.zeros((ncells, values.shape[1]), dtype=values.dtype)
    num = num.at[lin.reshape(-1)].add((wa[..., None] * values[:, None, :]).reshape(-1, values.shape[1]))
    den = jnp.zeros((ncells,), dtype=values.dtype).at[lin.reshape(-1)].add(w.reshape(-1))
    return num, den


def interpolate_from_grid(field_flat, positions, shape):
    """Peskin-weighted interpolation of a flat (ncells, c) field at markers."""
    lin, w = _marker_stencil(positions, shape)
    vals = field_flat[lin]  # (n, 64, c)
    num = jnp.sum(w[..., None] * vals, axis=1)
    den = jnp.sum(w, axis=1)
    return num / jnp.maximum(den, 1e-12)[:, None]


class IBMStepper(IncompressibleNavierStokesStepper):
    """NSE stepper with immersed-boundary coupling.

    Call signature (parity with reference ibm_stepper.py:380-393)::

        f_0, f_1, lagr_forces = stepper(
            f_0, f_1, vertices, areas, velocities,
            bc_mask, missing_mask, omega, timestep)
    """

    def __init__(
        self,
        grid,
        boundary_conditions=(),
        collision_type="BGK",
        ibm_max_iterations=4,
        ibm_tolerance=1e-5,  # accepted for parity; fixed iterations are used
        ibm_relaxation=1.0,
        **kwargs,
    ):
        super().__init__(grid, boundary_conditions, collision_type=collision_type, **kwargs)
        self.ibm_max_iterations = int(ibm_max_iterations)
        self.ibm_tolerance = float(ibm_tolerance)
        self.ibm_relaxation = float(ibm_relaxation)

    def __call__(self, f_0, f_1, vertices, areas, velocities, bc_mask, missing_mask, omega, timestep=0):
        shape = self.grid.shape
        vs = self.velocity_set
        mac = Macroscopic(vs, self.precision_policy, self.compute_backend)

        # 1. plain NSE step
        f_0, f_1 = super().__call__(f_0, f_1, bc_mask, missing_mask, omega, timestep)

        # 2. iterative direct forcing toward the solid velocity
        rho, u = mac(self.precision_policy.cast_to_compute(f_1))
        u_flat = u.reshape(vs.d, -1).T  # (ncells, d)
        vertices = vertices.astype(u_flat.dtype)
        velocities = velocities.astype(u_flat.dtype)
        areas = areas.astype(u_flat.dtype)

        def body(_, carry):
            forces, correction_flat = carry
            u_corr = u_flat + correction_flat
            u_interp = interpolate_from_grid(u_corr, vertices, shape)
            forces = forces + (velocities - u_interp)
            num, den = spread_to_grid(forces, vertices, areas, shape)
            target = num / jnp.maximum(den, 1e-12)[:, None]
            correction_flat = jnp.where(
                (den > 0.0)[:, None], self.ibm_relaxation * (target - u_flat), 0.0
            )
            return forces, correction_flat

        forces0 = jnp.zeros_like(vertices)
        corr0 = jnp.zeros_like(u_flat)
        forces, correction_flat = jax.lax.fori_loop(0, self.ibm_max_iterations, body, (forces0, corr0))

        # 3. apply the Eulerian correction to the populations via the
        #    exact-difference of equilibria (reference correct_population_ibm)
        correction = correction_flat.T.reshape((vs.d,) + shape)
        feq = quadratic_equilibrium(rho, u, vs._c, vs._w, self.compute_dtype)
        feq_force = quadratic_equilibrium(rho, u + correction, vs._c, vs._w, self.compute_dtype)
        f_1 = (self.precision_policy.cast_to_compute(f_1) + (feq_force - feq)).astype(self.store_dtype)

        return f_0, f_1, forces
