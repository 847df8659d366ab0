"""Equilibrium (fixed rho/u) boundary condition.

Parity with reference xlb/operator/boundary_condition/bc_equilibrium.py:72-80:
populations at tagged voxels are replaced with feq(rho_prescribed,
u_prescribed).  Common inlet/outlet condition.
"""

import numpy as np
import jax.numpy as jnp

from xlb_tpu.boundary.base import BoundaryCondition, ImplementationStep
from xlb_tpu.ops.equilibrium import quadratic_equilibrium_np


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
        # computed in NumPy: the prescribed feq must be a host constant
        vs = self.velocity_set
        if self.equilibrium_operator is not None:
            feq = np.asarray(self.equilibrium_operator(jnp.array([self.rho]), jnp.array(self.u)))
        else:
            feq = quadratic_equilibrium_np(np.array([self.rho]), np.array(self.u), vs._c, vs._w)
        return feq.reshape((vs.q,) + (1,) * spatial_ndim).astype(np.dtype(dtype))

    def __call__(self, f_pre, f_post, bc_mask, missing_mask):
        feq = self._prescribed_feq(f_post.ndim - 1, f_post.dtype)
        return jnp.where(self.boundary_map(bc_mask), feq, f_post)
