"""Bounce-back boundary conditions (fullway and halfway, with moving walls).

Parity with reference bc_fullway_bounce_back.py:50-57 and
bc_halfway_bounce_back.py:30-192.
"""

from typing import Callable, Tuple, Union

import numpy as np
import jax.numpy as jnp

from xlb_tpu.boundary.base import BoundaryCondition, ImplementationStep


class FullwayBounceBackBC(BoundaryCondition):
    """No-slip wall: at tagged (solid-shell) voxels every population is
    replaced by the opposite pre-streaming population.  Applied at the
    COLLISION step."""

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
            ImplementationStep.COLLISION,
            velocity_set,
            precision_policy,
            compute_backend,
            indices,
            mesh_vertices,
            voxelization_method,
        )

    def __call__(self, f_pre, f_post, bc_mask, missing_mask):
        flipped = f_pre[self.velocity_set._opp_indices]
        return jnp.where(self.boundary_map(bc_mask), flipped, f_post)


class HalfwayBounceBackBC(BoundaryCondition):
    """Halfway bounce-back on the fluid-side shell: only missing directions
    are reflected, with an optional moving-wall momentum correction

        f_l <- f_pre[opp(l)] + 6 w_l rho0 (c_l . u_wall)

    (reference bc_halfway_bounce_back.py:116-143).  ``prescribed_value`` gives
    a constant wall velocity; ``profile`` a callable returning one:

    - ``profile()`` -> (d,) or (d, 1): constant wall velocity,
    - ``profile(coords)`` with coords (d, n) voxel positions -> (d, n):
      spatially-varying wall velocity (e.g. a rotating body; the reference
      implements this per-thread in Warp, rotating_sphere_3d.py:114-143).
      Evaluated once at setup on this BC's dilated voxel set and scattered
      into the moving-wall field on device.
    """

    def __init__(
        self,
        velocity_set=None,
        precision_policy=None,
        compute_backend=None,
        indices=None,
        mesh_vertices=None,
        voxelization_method=None,
        profile: Callable = None,
        prescribed_value: Union[float, Tuple[float, ...], np.ndarray] = None,
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
        self.profile = profile
        self.needs_moving_wall_treatment = (profile is not None) or (prescribed_value is not None)

        if prescribed_value is not None:
            if profile is not None:
                raise ValueError("specify either profile or prescribed_value, not both")
            value = np.asarray(prescribed_value, dtype=np.float64)
            assert value.shape == (self.velocity_set.d,), "wall velocity must have d components"
            self.profile = lambda: value.reshape(-1, 1)

    def __call__(self, f_pre, f_post, bc_mask, missing_mask):
        vs = self.velocity_set
        boundary = self.boundary_map_q(bc_mask)

        moving_wall = 0.0
        if self.needs_moving_wall_treatment:
            moving_wall = self._moving_wall_term(f_post)

        reflected = f_pre[vs._opp_indices] + moving_wall
        return jnp.where(jnp.logical_and(missing_mask, boundary), reflected, f_post)

    def _moving_wall_term(self, f_post):
        """6 w_l (c_l . u_wall): a broadcast host constant for uniform walls,
        or a device scatter over this BC's voxels for spatial profiles."""
        import inspect

        vs = self.velocity_set
        dtype = np.dtype(f_post.dtype)
        takes_coords = len(inspect.signature(self.profile).parameters) >= 1

        if not takes_coords:
            u_wall = np.asarray(self.profile(), dtype=np.float64).reshape(vs.d, -1)
            if u_wall.shape[1] == 1:
                cu = vs._w[:, None] * (vs._c.T.astype(np.float64) @ u_wall)
                return (6.0 * cu).reshape((-1,) + (1,) * (f_post.ndim - 1)).astype(dtype)
            raise ValueError("zero-arg profile must return a single wall velocity vector")

        # spatial profile: evaluate at the dilated voxel set (the fluid-side
        # shell where missing directions live) and scatter on device
        if self.indices is None:
            raise ValueError("a spatial wall-velocity profile requires explicit indices")
        idx = self.pad_indices()  # (d, n) includes the fluid shell
        u_wall = np.asarray(self.profile(np.asarray(idx, dtype=np.float64)), dtype=np.float64)
        assert u_wall.shape == idx.shape[:1] + (idx.shape[1],), f"profile returned {u_wall.shape}, expected {(vs.d, idx.shape[1])}"
        mw = 6.0 * vs._w[:, None] * (vs._c.T.astype(np.float64) @ u_wall)  # (q, n)
        field = jnp.zeros((vs.q,) + f_post.shape[1:], dtype=dtype)
        return field.at[(slice(None),) + tuple(idx)].set(mw.astype(dtype))
