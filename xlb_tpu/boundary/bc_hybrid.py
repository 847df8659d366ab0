"""Hybrid curved-boundary condition (interpolated bounce-back + closure).

Parity with reference bc_hybrid.py:39-391 (Warp/Neon-only, 3D-only there)
and its helper math (helper_functions_bc.py:150-340).  Four methods (the
first is an upgrade beyond the reference's three):

- ``bounceback``: plain Yu-Mei-Shyy single-node interpolated bounce-back
  of the missing populations, no reconstruction of the known ones -- the
  least diffusive choice, used by the quantitative curved-wall benchmarks
  (examples/cfd/cylinder_benchmark_schafer_turek.py).
- ``bounceback_regularized``: Yu-Mei-Shyy single-node interpolated
  bounce-back for the missing populations, then Latt-Chopard regularization
  of all populations from (rho, u) of the post-BB state.
- ``bounceback_grads``: interpolated bounce-back, then Grad's approximation
  (Dorschner et al. 2015) for the missing populations.
- ``nonequilibrium_regularized``: Tao et al. (2018) one-point second-order
  curved closure, then regularization.

Fractional wall distances (t in [0,1] per missing link) come from
``xlb_tpu.geometry.distances`` instead of f_1 aux-slot encoding; voxels
without a distance fall back to the halfway value (t = 1/2).
"""

import numpy as np
import jax.numpy as jnp

from xlb_tpu.boundary.base import BoundaryCondition, ImplementationStep
from xlb_tpu.ops.equilibrium import quadratic_equilibrium
from xlb_tpu.ops.macroscopic import density, velocity, momentum_flux
from xlb_tpu.ops.stencil_math import stencil_contract

_METHODS = ("bounceback", "bounceback_regularized", "bounceback_grads", "nonequilibrium_regularized")


class HybridBC(BoundaryCondition):
    def __init__(
        self,
        bc_method="bounceback_regularized",
        profile=None,
        prescribed_value=None,
        use_mesh_distance=True,
        velocity_set=None,
        precision_policy=None,
        compute_backend=None,
        indices=None,
        mesh_vertices=None,
        voxelization_method=None,
    ):
        if bc_method not in _METHODS:
            raise ValueError(f"bc_method must be one of {_METHODS}, got {bc_method!r}")
        self.bc_method = bc_method
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
        self.needs_mesh_distance = bool(use_mesh_distance and mesh_vertices is not None)
        self.needs_moving_wall_treatment = (profile is not None) or (prescribed_value is not None)
        self.profile = profile
        if prescribed_value is not None:
            value = np.asarray(prescribed_value, dtype=np.float64)
            assert value.shape == (self.velocity_set.d,)
            self.profile = lambda: value.reshape(-1, 1)
        # (q, n) normalized distances at self._distance_voxels, set by
        # compute_mesh_distances() after voxelization
        self._distance_voxels = None
        self._distances = None

    # ------------------------------------------------------------------
    def compute_mesh_distances(self):
        """Populate per-voxel directional wall distances from the mesh.

        Stored in the MISSING-direction convention: ``_distances[l]`` is
        the weight consumed when direction ``l`` is missing, i.e. the
        crossing fraction along ``c_opp(l)`` (the wall sits behind the
        pull source ``x - c_l``).  This mirrors the reference decoder,
        which reads the aux slot at ``opp(direction)``
        (bc_hybrid.py:209-212, masker ray.py:62-77)."""
        from xlb_tpu.geometry.distances import directional_wall_distances

        if self.mesh_vertices is None or self.indices is None:
            return
        tris = np.asarray(self.mesh_vertices, dtype=np.float64)
        if tris.ndim == 2:
            tris = tris.reshape(-1, 3, 3)
        voxels = self.pad_indices()
        along_c = directional_wall_distances(tris, voxels.astype(np.float64), self.velocity_set._c)
        self.set_link_distances(voxels, along_c)

    def set_link_distances(self, voxels, distances_along_c):
        """Attach externally computed per-link wall distances.

        ``distances_along_c`` is (q, n) with entry [l, i] = normalized
        crossing fraction of the link FROM voxel i ALONG ``c_l`` (inf for
        no crossing) -- the convention of
        ``geometry.distances.directional_wall_distances`` and
        ``implicit_link_distances``.  Rows are re-indexed here to the
        missing-direction convention used by both tiers' kernels.  Use
        this for analytic / implicit geometry (e.g. a 2D cylinder) where
        no triangle mesh exists."""
        self._distance_voxels = np.asarray(voxels)
        self._distances = np.asarray(distances_along_c)[self.velocity_set._opp_indices]
        self.needs_mesh_distance = True

    def _weight_field(self, shape, dtype):
        """Per-(direction, voxel) interpolation weights, defaulting to the
        halfway value where no mesh distance is available."""
        vs = self.velocity_set
        field = jnp.full((vs.q,) + shape, 0.5, dtype=dtype)
        if self._distances is not None:
            vals = np.where(np.isfinite(self._distances), self._distances, 0.5).astype(np.dtype(dtype))
            vals = np.clip(vals, 0.0, 1.0)
            field = field.at[(slice(None),) + tuple(self._distance_voxels)].set(vals)
        return field

    def _u_wall_term(self, f_post):
        """6 w_l (c_l . u_wall) moving-wall correction and the wall
        velocity, or (0.0, None).

        Constant walls return a broadcastable host constant and the (d, 1)
        velocity.  Spatial (coordinate-taking) profiles are evaluated once
        at the dilated fluid-side shell and scattered on device — both the
        (q, ...) correction field and the (d, ...) wall-velocity field —
        mirroring HalfwayBounceBackBC._moving_wall_term (the reference
        evaluates profile functionals per-thread, bc_hybrid.py:39-391)."""
        if not self.needs_moving_wall_treatment:
            return 0.0, None
        import inspect

        vs = self.velocity_set
        dtype = np.dtype(f_post.dtype)
        takes_coords = len(inspect.signature(self.profile).parameters) >= 1
        if not takes_coords:
            u_wall = np.asarray(self.profile(), dtype=np.float64).reshape(vs.d, 1)
            mw = 6.0 * vs._w[:, None] * (vs._c.T.astype(np.float64) @ u_wall)
            return mw.reshape((-1,) + (1,) * (f_post.ndim - 1)).astype(dtype), u_wall
        if self.indices is None:
            raise ValueError(
                "a spatial wall-velocity profile requires voxel indices (mesh-based BCs: run prepare_fields first)"
            )
        idx = self.pad_indices()  # (d, n): the fluid shell where missing dirs live
        u_wall = np.asarray(self.profile(np.asarray(idx, dtype=np.float64)), dtype=np.float64)
        assert u_wall.shape == (vs.d, idx.shape[1]), f"profile returned {u_wall.shape}, expected {(vs.d, idx.shape[1])}"
        mw = 6.0 * vs._w[:, None] * (vs._c.T.astype(np.float64) @ u_wall)  # (q, n)
        mw_field = jnp.zeros((vs.q,) + f_post.shape[1:], dtype=dtype)
        mw_field = mw_field.at[(slice(None),) + tuple(idx)].set(mw.astype(dtype))
        uw_field = jnp.zeros((vs.d,) + f_post.shape[1:], dtype=dtype)
        uw_field = uw_field.at[(slice(None),) + tuple(idx)].set(u_wall.astype(dtype))
        return mw_field, uw_field

    # ------------------------------------------------------------------
    def _interpolated_bounceback(self, f_pre, f_post, missing_mask, weights):
        """Yu-Mei-Shyy single-node interpolated bounce-back
        (helper_functions_bc.py:253-293)."""
        vs = self.velocity_set
        opp = vs._opp_indices
        if self.needs_mesh_distance:
            interp = ((1.0 - weights) * f_post[opp] + weights * (f_pre + f_pre[opp])) / (1.0 + weights)
        else:
            interp = f_pre[opp]
        # sandwich case: both directions missing -> plain bounce-back
        sandwich = jnp.logical_and(missing_mask, missing_mask[opp])
        interp = jnp.where(sandwich, f_pre[opp], interp)
        mw, _ = self._u_wall_term(f_post)
        if self.needs_moving_wall_treatment:
            interp = interp + mw
        return jnp.where(missing_mask, interp, f_post)

    def _regularize(self, fpop, feq):
        vs = self.velocity_set
        pi_neq = momentum_flux(fpop - feq, vs._cc, fpop.dtype)
        qipi = stencil_contract(vs._qi, pi_neq)
        w = vs._w.astype(np.dtype(fpop.dtype)).reshape((-1,) + (1,) * (fpop.ndim - 1))
        return feq + 4.5 * w * qipi

    def _grads_approximation(self, missing_mask, rho, u, f_post):
        """Grad's closure for the missing populations
        (helper_functions_bc.py:186-232): f_l = rho w_l (1 + 3 c.u)
        + 4.5 w_l Q_l : (Pi - rho/3 I)."""
        vs = self.velocity_set
        pi = momentum_flux(f_post, vs._cc, f_post.dtype)
        diag = vs.diagonal_moment_indices
        pi_dev = [pi[t] - rho[0] / 3.0 if t in diag else pi[t] for t in range(pi.shape[0])]
        qipi = stencil_contract(vs._qi, jnp.stack(pi_dev))
        cu = 3.0 * stencil_contract(vs._c.T, u)
        w = vs._w.astype(np.dtype(f_post.dtype)).reshape((-1,) + (1,) * (f_post.ndim - 1))
        grads = rho * w * (1.0 + cu) + 4.5 * w * qipi
        return jnp.where(missing_mask, grads, f_post)

    def _tao_closure(self, f_pre, f_post, missing_mask, weights):
        """Tao et al. (2018) one-point curved closure
        (helper_functions_bc.py:295-340)."""
        vs = self.velocity_set
        opp = vs._opp_indices
        rho = density(f_pre)
        u = velocity(f_pre, rho, vs._c, f_pre.dtype)
        feq = quadratic_equilibrium(rho, u, vs._c, vs._w, f_pre.dtype)
        fneq = f_pre[opp] - feq[opp]

        w_l = vs._w.astype(np.dtype(f_pre.dtype)).reshape((-1,) + (1,) * (f_pre.ndim - 1))
        if self.needs_moving_wall_treatment:
            _, u_wall = self._u_wall_term(f_post)
            if isinstance(u_wall, np.ndarray):  # constant wall: broadcast host value
                u_wall_field = jnp.asarray(np.broadcast_to(u_wall, (vs.d, 1)).astype(np.dtype(f_pre.dtype))).reshape(
                    (vs.d,) + (1,) * (f_pre.ndim - 1)
                ) + jnp.zeros_like(u)
            else:  # spatial profile: already a (d, ...) device field
                u_wall_field = u_wall
            feq_wall = quadratic_equilibrium(rho, u_wall_field, vs._c, vs._w, f_pre.dtype)
        else:
            feq_wall = w_l * rho  # zero-velocity equilibrium

        f_wall = feq_wall + fneq
        closed = (f_wall + weights * f_pre) / (1.0 + weights)
        return jnp.where(missing_mask, closed, f_post)

    # ------------------------------------------------------------------
    def __call__(self, f_pre, f_post, bc_mask, missing_mask):
        vs = self.velocity_set
        boundary = self.boundary_map(bc_mask)
        weights = self._weight_field(f_post.shape[1:], f_post.dtype) if (self.needs_mesh_distance or self.bc_method == "nonequilibrium_regularized") else None

        if self.bc_method in ("bounceback", "bounceback_regularized", "bounceback_grads"):
            f_bd = self._interpolated_bounceback(f_pre, f_post, missing_mask, weights)
            if self.bc_method == "bounceback_regularized":
                rho = density(f_bd)
                u = velocity(f_bd, rho, vs._c, f_bd.dtype)
                feq = quadratic_equilibrium(rho, u, vs._c, vs._w, f_bd.dtype)
                f_bd = self._regularize(f_bd, feq)
            elif self.bc_method == "bounceback_grads":
                rho = density(f_bd)
                u = velocity(f_bd, rho, vs._c, f_bd.dtype)
                f_bd = self._grads_approximation(missing_mask, rho, u, f_bd)
        else:
            f_bd = self._tao_closure(f_pre, f_post, missing_mask, weights)
            rho = density(f_bd)
            u = velocity(f_bd, rho, vs._c, f_bd.dtype)
            feq = quadratic_equilibrium(rho, u, vs._c, vs._w, f_bd.dtype)
            f_bd = self._regularize(f_bd, feq)

        return jnp.where(boundary, f_bd, f_post)
