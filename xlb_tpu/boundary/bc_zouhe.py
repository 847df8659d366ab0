"""Zou-He (non-equilibrium bounce-back) velocity/pressure boundary condition.

Parity with reference bc_zouhe.py:36-303.  The prescribed value (velocity
vector or density) is closed by the Zou-He mass balance at the boundary,
missing populations are reconstructed by non-equilibrium bounce-back:

    f_missing = f[opp] + feq - feq[opp]

Tangential corrections are intentionally omitted (as in the reference); use
:class:`RegularizedBC` at higher Reynolds numbers.
"""

from typing import Callable, Tuple, Union

import numpy as np
import jax.numpy as jnp

from xlb_tpu.boundary.base import BoundaryCondition, ImplementationStep
from xlb_tpu.ops.equilibrium import quadratic_equilibrium


def _broadcast_prescribed(values, target_shape):
    """Broadcast (k,) / (k, 1) / (k, *spatial-slab) prescribed values to
    ``target_shape`` by inserting singleton dims after the leading axis
    (reference bc_zouhe.py:179-216).

    Stays in NumPy: prescribed values are host constants, and eager device
    ops at trace time would force device fetches during lowering.
    """
    values = np.asarray(values)
    if values.ndim == 0:
        values = values.reshape((1,) * len(target_shape))
    elif values.ndim < len(target_shape):
        missing = len(target_shape) - values.ndim
        values = values.reshape((values.shape[0],) + (1,) * missing + values.shape[1:])
    # broadcast only the leading (component) axis; spatial axes stay size-1
    # and broadcast lazily inside the traced arithmetic
    return values


class ZouHeBC(BoundaryCondition):
    def __init__(
        self,
        bc_type: str,
        profile: Callable = None,
        prescribed_value: Union[float, Tuple[float, ...], np.ndarray] = None,
        velocity_set=None,
        precision_policy=None,
        compute_backend=None,
        indices=None,
        mesh_vertices=None,
        voxelization_method=None,
    ):
        assert bc_type in ("velocity", "pressure"), f"bc_type must be 'velocity' or 'pressure', got {bc_type!r}"
        self.bc_type = bc_type
        super().__init__(
            ImplementationStep.STREAMING,
            velocity_set,
            precision_policy,
            compute_backend,
            indices,
            mesh_vertices,
            voxelization_method,
        )
        self.needs_padding = True
        self.profile = profile

        if prescribed_value is not None:
            if profile is not None:
                raise ValueError("specify either profile or prescribed_value, not both")
            if bc_type == "velocity":
                value = np.asarray(prescribed_value, dtype=np.float64)
                assert value.ndim == 1, "velocity prescribed_value must be a d-vector"
            else:
                value = np.asarray(float(prescribed_value), dtype=np.float64).reshape(1)
            self.profile = lambda: value.reshape(-1, 1)

        if self.profile is None:
            raise ValueError("ZouHeBC requires a prescribed_value or a profile")
        self.prescribed_values = np.asarray(self.profile())

    # -- geometric helpers (reference bc_zouhe.py:166-177) ----------------
    def _known_middle_masks(self, missing_mask):
        known = missing_mask[self.velocity_set._opp_indices]
        middle = ~(missing_mask | known)
        return known, middle

    def _normal_vectors(self, missing_mask):
        """Inward unit normal per voxel from the missing main directions."""
        vs = self.velocity_set
        from xlb_tpu.ops.stencil_math import stencil_contract

        m = missing_mask[vs.main_indices]
        return -stencil_contract(vs._c[:, vs.main_indices], m.astype(jnp.int32))

    # -- Zou-He closure (reference bc_zouhe.py:218-268) --------------------
    def _closure_rho_u(self, fpop, missing_mask):
        normals = self._normal_vectors(missing_mask).astype(fpop.dtype)
        known, middle = self._known_middle_masks(missing_mask)
        fsum = jnp.sum(fpop * middle, axis=0, keepdims=True) + 2.0 * jnp.sum(fpop * known, axis=0, keepdims=True)

        d = self.velocity_set.d
        if self.bc_type == "velocity":
            vel = _broadcast_prescribed(self.prescribed_values, (d,) + fpop.shape[1:]).astype(np.dtype(fpop.dtype))
            unormal = jnp.sum(normals * vel, axis=0, keepdims=True)
            rho = fsum / (1.0 + unormal)
            vel = vel + jnp.zeros_like(fsum)  # broadcast to full spatial shape lazily
        else:
            rho = _broadcast_prescribed(self.prescribed_values, (1,) + fpop.shape[1:]).astype(np.dtype(fpop.dtype))
            unormal = -1.0 + fsum / rho
            vel = unormal * normals
            rho = rho + jnp.zeros_like(fsum)
        return rho, vel

    def calculate_equilibrium(self, f_post, missing_mask):
        rho, vel = self._closure_rho_u(f_post, missing_mask)
        vs = self.velocity_set
        return quadratic_equilibrium(rho, vel, vs._c, vs._w, f_post.dtype)

    def bounceback_nonequilibrium(self, fpop, feq, missing_mask):
        opp = self.velocity_set._opp_indices
        fknown = fpop[opp] + feq - feq[opp]
        return jnp.where(missing_mask, fknown, fpop)

    # ----------------------------------------------------------------------
    def __call__(self, f_pre, f_post, bc_mask, missing_mask):
        boundary = self.boundary_map(bc_mask)
        feq = self.calculate_equilibrium(f_post, missing_mask)
        f_bd = self.bounceback_nonequilibrium(f_post, feq, missing_mask)
        return jnp.where(boundary, f_bd, f_post)
