"""Equilibrium initialization of distribution fields.

Parity with reference xlb/helper/initializers.py:25-72.
"""

import numpy as np
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


class CustomInitializer:
    """Per-region equilibrium initializer (reference helper/initializers.py:
    104-...): initializes the whole domain to (rho_0, u_0) and voxels tagged
    with ``bc_id`` in ``bc_mask`` to (rho_bc, u_bc).

    Use as the ``initializer`` argument of ``stepper.prepare_fields``.
    """

    def __init__(self, rho_0=1.0, u_0=None, bc_id=None, rho_bc=None, u_bc=None, velocity_set=None, precision_policy=None):
        from xlb_tpu.default_config import DefaultConfig

        self.velocity_set = velocity_set or DefaultConfig.velocity_set
        self.precision_policy = precision_policy or DefaultConfig.default_precision_policy
        d = self.velocity_set.d
        self.rho_0 = float(rho_0)
        self.u_0 = np.asarray(u_0 if u_0 is not None else [0.0] * d, dtype=np.float64)
        self.bc_id = bc_id
        self.rho_bc = float(rho_bc) if rho_bc is not None else None
        self.u_bc = np.asarray(u_bc, dtype=np.float64) if u_bc is not None else None

    def __call__(self, bc_mask, f):
        vs = self.velocity_set
        pp = self.precision_policy
        spatial = f.shape[1:]
        shape_u = (vs.d,) + spatial
        rho = jnp.full((1,) + spatial, self.rho_0, dtype=pp.compute_dtype)
        u = jnp.broadcast_to(jnp.asarray(self.u_0, dtype=pp.compute_dtype).reshape((vs.d,) + (1,) * len(spatial)), shape_u)
        if self.bc_id is not None:
            region = bc_mask == self.bc_id
            if self.rho_bc is not None:
                rho = jnp.where(region, pp.compute_dtype(self.rho_bc), rho)
            if self.u_bc is not None:
                u_bc = jnp.asarray(self.u_bc, dtype=pp.compute_dtype).reshape((vs.d,) + (1,) * len(spatial))
                u = jnp.where(region, u_bc, u)
        feq = quadratic_equilibrium(rho, u, vs._c, vs._w, pp.compute_dtype)
        return feq.astype(pp.store_dtype)


def initialize_from_macroscopic(grid, velocity_set, precision_policy, rho, u):
    """Equilibrium-initialize from user-provided (rho, u) arrays."""
    rho = jnp.asarray(rho, dtype=precision_policy.compute_dtype)
    u = jnp.asarray(u, dtype=precision_policy.compute_dtype)
    feq = quadratic_equilibrium(rho, u, velocity_set._c, velocity_set._w, precision_policy.compute_dtype)
    return grid.with_sharding(feq.astype(precision_policy.store_dtype))
