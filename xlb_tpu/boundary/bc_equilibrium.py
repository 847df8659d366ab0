"""Equilibrium (fixed rho/u) boundary condition.

Parity with reference xlb/operator/boundary_condition/bc_equilibrium.py:72-80:
populations at tagged voxels are replaced with feq(rho_prescribed,
u_prescribed).  Common inlet/outlet condition.
"""

import jax.numpy as jnp

from xlb_tpu.boundary.base import BoundaryCondition, ImplementationStep
from xlb_tpu.ops.equilibrium import quadratic_equilibrium


class EquilibriumBC(BoundaryCondition):
    def __init__(
        self,
        rho: float,
        u,
        equilibrium_operator=None,
        velocity_set=None,
        precision_policy=None,
        compute_backend=None,
        indices=None,
        mesh_vertices=None,
        voxelization_method=None,
    ):
        super().__init__(
            ImplementationStep.STREAMING,
            velocity_set,
            precision_policy,
            compute_backend,
            indices,
            mesh_vertices,
            voxelization_method,
        )
        self.rho = float(rho)
        self.u = tuple(float(x) for x in u)
        assert len(self.u) == self.velocity_set.d
        self.equilibrium_operator = equilibrium_operator  # accepted for parity; quadratic by default

    def _prescribed_feq(self, spatial_ndim, dtype):
        vs = self.velocity_set
        rho = jnp.array([self.rho], dtype=dtype)
        u = jnp.array(self.u, dtype=dtype)
        if self.equilibrium_operator is not None:
            feq = self.equilibrium_operator(rho, u)
        else:
            feq = quadratic_equilibrium(rho, u, vs._c, vs._w, dtype)
        return feq.reshape((vs.q,) + (1,) * spatial_ndim)

    def __call__(self, f_pre, f_post, bc_mask, missing_mask):
        feq = self._prescribed_feq(f_post.ndim - 1, f_post.dtype)
        return jnp.where(self.boundary_map(bc_mask), feq, f_post)
