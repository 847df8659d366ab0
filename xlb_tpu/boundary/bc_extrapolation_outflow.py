"""Extrapolation outflow boundary condition (Geier et al. 2015, Sec 3.3.2.1).

Parity with reference bc_extrapolation_outflow.py:34-155.  After collision,
an extrapolated population

    f_ext = cs * f_neighbor + (1 - cs) * f_boundary     (cs = 1/sqrt(3))

is staged in the opposite (outgoing) slots of the post-collision buffer;
after the next streaming those slots arrive back at the boundary voxel and
the BC copies them into the missing directions.
"""

from collections import Counter

import numpy as np
import jax.numpy as jnp

from xlb_tpu.boundary.base import BoundaryCondition, ImplementationStep


class ExtrapolationOutflowBC(BoundaryCondition):
    def __init__(
        self,
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
        self.needs_aux_recovery = True
        if indices is None:
            raise ValueError("ExtrapolationOutflowBC requires explicit indices (a planar outflow face)")
        self.normal = self._face_normal(indices)

    def _face_normal(self, indices):
        """Outward normal of the (planar) outflow face, inferred as the axis
        whose coordinate is constant across the face (reference
        bc_extrapolation_outflow.py:78-94)."""
        freq = [Counter(coord).most_common(1)[0] for coord in indices]
        counts = np.array([count for _, count in freq])
        elements = np.array([element for element, _ in freq])
        normal = counts // counts.max()
        if elements[np.argmax(counts)] == 0:
            normal = -normal
        return normal

    def _roll(self, fld, vec):
        spatial_axes = tuple(range(1, fld.ndim))
        return jnp.roll(fld, shift=tuple(int(v) for v in vec), axis=spatial_axes)

    def assemble_auxiliary_data(self, f_pre, f_post, bc_mask, missing_mask):
        """Stage extrapolated populations into outgoing slots post-collision
        (f_pre = post-stream state, f_post = post-collision state)."""
        sound_speed = float(1.0 / np.sqrt(3.0))
        boundary = self.boundary_map_q(bc_mask)
        neighbour = self._roll(boundary, -self.normal)

        fpop = jnp.where(boundary, f_pre, f_post)
        fpop_neighbour = jnp.where(neighbour, f_pre, f_post)
        fpop_neighbour = self._roll(fpop_neighbour, self.normal)
        fpop_extrapolated = sound_speed * fpop_neighbour + (1.0 - sound_speed) * fpop

        opp = self.velocity_set._opp_indices
        known_mask = missing_mask[opp]
        return jnp.where(jnp.logical_and(boundary, known_mask), fpop_extrapolated[opp], f_post)

    def __call__(self, f_pre, f_post, bc_mask, missing_mask):
        boundary = self.boundary_map_q(bc_mask)
        return jnp.where(
            jnp.logical_and(missing_mask, boundary),
            f_pre[self.velocity_set._opp_indices],
            f_post,
        )
