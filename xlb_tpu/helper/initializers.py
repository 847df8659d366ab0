"""Equilibrium initialization of distribution fields.

Parity with reference xlb/helper/initializers.py:25-72.
"""

import jax
import jax.numpy as jnp

from xlb_tpu.ops.equilibrium import quadratic_equilibrium


def initialize_eq(f, grid, velocity_set, precision_policy, compute_backend=None, rho=None, u=None):
    """Return f initialized to feq(rho, u); defaults rho=1, u=0."""

    def _init(rho, u):
        feq = quadratic_equilibrium(rho, u, velocity_set._c, velocity_set._w, precision_policy.compute_dtype)
        return feq.astype(precision_policy.store_dtype)

    if rho is None:
        rho = grid.create_field(cardinality=1, fill_value=1.0, dtype=precision_policy.compute_precision)
    if u is None:
        u = grid.create_field(cardinality=velocity_set.d, fill_value=0.0, dtype=precision_policy.compute_precision)
    return jax.jit(_init, out_shardings=grid.sharding)(rho, u)


def initialize_from_macroscopic(grid, velocity_set, precision_policy, rho, u):
    """Equilibrium-initialize from user-provided (rho, u) arrays."""
    rho = jnp.asarray(rho, dtype=precision_policy.compute_dtype)
    u = jnp.asarray(u, dtype=precision_policy.compute_dtype)
    feq = quadratic_equilibrium(rho, u, velocity_set._c, velocity_set._w, precision_policy.compute_dtype)
    return grid.with_sharding(feq.astype(precision_policy.store_dtype))
