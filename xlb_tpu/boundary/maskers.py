"""Boundary maskers: rasterize BC lists into ``bc_mask`` / ``missing_mask``.

:class:`IndicesBoundaryMasker` implements the pad -> tag -> stream -> crop
algorithm of the reference JAX path (indices_boundary_masker.py:76-143):

1. pad the domain by one voxel, marking the exterior as "missing source";
2. tag solid voxels of interior geometry as missing sources too;
3. pull-stream the boolean mask once: direction l of voxel x becomes missing
   iff its pull source x - c_l is a missing source;
4. crop the padding and write BC ids into ``bc_mask``.

This is pure array code and runs sharded under GSPMD; it executes once at
setup time.  Mesh-based maskers (STL voxelization) live in
``xlb_tpu.geometry`` and feed their voxel indices through this class.
"""

import numpy as np
import jax.numpy as jnp

from xlb_tpu.operator import Operator
from xlb_tpu.ops.stream import stream_pull


class IndicesBoundaryMasker(Operator):
    def __init__(self, velocity_set=None, precision_policy=None, compute_backend=None, grid=None):
        super().__init__(velocity_set, precision_policy, compute_backend)
        self.grid = grid

    def _interior_flags(self, indices, shape):
        """True per index column when strictly inside the domain (not on the
        outer shell)."""
        d = self.velocity_set.d
        shape = np.asarray(shape)
        idx = np.asarray(indices)[:d]
        return np.all((idx > 0) & (idx < shape[:d, None] - 1), axis=0)

    def __call__(self, bclist, bc_mask, missing_mask, start_index=None):
        d = self.velocity_set.d
        grid_shape = bc_mask.shape[1:]
        if start_index is None:
            start_index = (0,) * d
        origin = np.asarray(start_index)[:, None]

        pad_spatial = ((1, 1),) * d
        bc_ext = jnp.pad(bc_mask[0], pad_spatial, constant_values=0)
        miss_ext = jnp.pad(missing_mask, ((0, 0),) + pad_spatial, constant_values=True)
        shift = np.ones((d, 1), dtype=np.int64)

        for bc in bclist:
            assert bc.indices is not None, f"{type(bc).__name__} has no indices; use a mesh masker for mesh-based BCs"
            bc_indices = np.asarray(bc.indices)

            solid = None
            if self._interior_flags(bc_indices, grid_shape).any():
                # interior geometry: the given indices are solid voxels; mark
                # them as missing sources and tag the dilated shell
                solid = bc_indices - origin + shift
                miss_ext = miss_ext.at[(slice(None),) + tuple(solid)].set(True)
                tag_indices = bc.pad_indices() - origin + shift
            else:
                tag_indices = bc_indices - origin + shift

            bc_ext = bc_ext.at[tuple(tag_indices)].set(bc.id)
            if solid is not None and bc.needs_padding:
                # fluid-side BCs (halfway/hybrid/ZouHe): the BC id lives on
                # the dilated shell; the solid voxels themselves are tagged
                # BC_SOLID so steppers freeze them (reference Warp masker,
                # indices_boundary_masker.py:166-172).  Without this, a
                # deeply-enclosed voxel with ~all directions missing keeps
                # colliding and KBC's entropic ratio turns NaN.
                bc_ext = bc_ext.at[tuple(solid)].set(255)

        miss_ext = stream_pull(miss_ext, self.velocity_set._c)

        crop = (slice(1, -1),) * d
        missing_mask = miss_ext[(slice(None),) + crop]
        bc_mask = bc_mask.at[0].set(bc_ext[crop])
        return bc_mask, missing_mask
