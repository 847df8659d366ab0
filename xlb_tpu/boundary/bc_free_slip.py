"""Free-slip (specular-reflection) boundary condition.

No counterpart anywhere in the reference (its wall zoo is bounce-back
no-slip only, xlb/operator/boundary_condition/) -- added because external
aerodynamics validation (e.g. sphere drag vs the standard drag curve) needs
lateral boundaries that do not grow boundary layers.

Halfway specular reflection: at a fluid-side wall voxel, every missing
direction l takes the pre-streaming population of its mirror direction
spec(l), where spec flips the wall-normal component of the lattice vector
and keeps the tangential ones:

    c_spec(l)[a] = -c_l[a],   c_spec(l)[b] = c_l[b]  (b != a)

Tangential momentum is preserved exactly (the tangential components of c
are untouched), normal momentum is reflected -- a stress-free wall at the
halfway plane.  Voxel-local, so it runs in the fused kernel and
differentiates through the fused adjoint automatically.
"""

import numpy as np
import jax.numpy as jnp

from xlb_tpu.boundary.base import BoundaryCondition, ImplementationStep


class FreeSlipBC(BoundaryCondition):
    """Specular-reflection wall on the fluid-side shell.

    Parameters
    ----------
    normal : (d,) ints
        Outward axis-aligned wall normal, e.g. (0, 0, 1) for a wall above
        the fluid.  Only the axis matters (specular reflection is the same
        for both orientations); it must be axis-aligned -- curved free-slip
        boundaries need a local-normal treatment this class does not do.
    """

    def __init__(
        self,
        velocity_set=None,
        precision_policy=None,
        compute_backend=None,
        indices=None,
        mesh_vertices=None,
        voxelization_method=None,
        normal=None,
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
        self.needs_padding = True
        if normal is None:
            raise ValueError("FreeSlipBC needs the axis-aligned wall `normal`, e.g. (0, 1) or (0, 0, 1)")
        normal = np.asarray(normal, dtype=np.int64).reshape(-1)
        d = self.velocity_set.d
        if normal.shape != (d,) or np.abs(normal).sum() != 1:
            raise ValueError(f"free-slip normal must be axis-aligned with {d} components, got {normal}")
        self.normal = normal
        axis = int(np.nonzero(normal)[0][0])
        self.axis = axis

        c = self.velocity_set._c
        target = c.copy()
        target[axis] = -target[axis]
        spec = []
        for l in range(self.velocity_set.q):
            (matches,) = np.nonzero((c == target[:, l : l + 1]).all(axis=0))
            assert matches.size == 1, "lattice is not mirror-symmetric?"
            spec.append(int(matches[0]))
        self.spec_indices = np.asarray(spec, dtype=np.int64)
        # reflect ONLY directions whose pull actually crosses this wall
        # (c[axis] == -sign(normal)).  The masker also tags directions that
        # merely wrap a periodic transverse edge at corner voxels
        # (pad -> stream marks every domain-exit as missing); those must
        # keep their wrapped (periodic) values or tangential transport --
        # and exact momentum conservation -- breaks at the corners.
        sign = int(np.sign(normal[axis]))
        self.reflect_dirs = c[axis] == -sign

    def __call__(self, f_pre, f_post, bc_mask, missing_mask):
        boundary = self.boundary_map_q(bc_mask)
        refl = self.reflect_dirs.reshape((-1,) + (1,) * (f_post.ndim - 1))
        sel = jnp.logical_and(jnp.logical_and(missing_mask, boundary), jnp.asarray(refl))
        reflected = f_pre[self.spec_indices]
        return jnp.where(sel, reflected, f_post)
