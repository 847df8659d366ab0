"""Immersed-boundary-method stepper (multi-direct forcing).

TPU-native counterpart of the reference IBMStepper
(xlb/operator/stepper/ibm_stepper.py:14-476, Warp-only there).  The same
velocity-based partition-of-unity formulation is used:

    target_u[i]   = sum_k w_ik A_k F_k / sum_k w_ik      (spread)
    correction[i] = relax * (target_u[i] - u[i])
    F_k          += U_solid_k - u_interp(X_k)            (marker update)

with the Peskin 4-point regularized delta as w.  Design differences for TPU:

- The Peskin delta is separable, w_ik = phi(i-x_k) phi(j-y_k) phi(k-z_k),
  so marker<->grid transfer factors into per-axis weight matrices
  A (Lx, n), B (Ly, n), C (Lz, n) and the spread/interpolation become
  chunked DENSE einsums that run on the MXU -- no scatter at all.  XLA's
  scatter-add lowers to a serialized per-update loop on TPU (measured
  ~70 ms per spread for 1.3M updates, ~54 ns each); the dense factored
  contraction does ~5000x more FLOPs and still wins by >25x because the
  MXU sustains tens of TFLOP/s (the reference leans on CUDA atomics +
  a wp.HashGrid for the same reason, ibm_stepper.py:110).
- An optional static marker WINDOW (``ibm_window``) restricts the dense
  transfer (and the population correction) to the moving AABB around the
  markers: static extents, dynamic offset from min(positions), so rigid
  bodies sweeping through a big domain pay for the window volume only.
- the fixed-point loop runs a static ``ibm_iterations`` count inside jit
  (a residual-based early exit would force a host sync per iteration --
  the reference needs pinned-memory tricks for exactly this reason,
  ibm_stepper.py:379-420),
- each iteration re-interpolates from the *corrected* velocity field, the
  standard multi-direct-forcing refinement (Inamuro 2012), so iterations
  actually tighten the no-slip constraint.

The whole step (NSE + IBM loop + population correction) is one jittable,
differentiable function.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from xlb_tpu.models.nse import IncompressibleNavierStokesStepper
from xlb_tpu.ops.macroscopic import Macroscopic
from xlb_tpu.ops.equilibrium import quadratic_equilibrium

_CHUNK = 1024  # markers per einsum chunk (bounds the (L, chunk) temporaries)


def peskin_weight(r):
    """Peskin's 4-point regularized delta function (reference
    ibm_stepper.py:156-174)."""
    abs_r = jnp.abs(r)
    inner = 0.125 * (3.0 - 2.0 * abs_r + jnp.sqrt(jnp.maximum(1.0 + 4.0 * abs_r - 4.0 * abs_r**2, 0.0)))
    outer = 0.125 * (5.0 - 2.0 * abs_r - jnp.sqrt(jnp.maximum(-7.0 + 12.0 * abs_r - 4.0 * abs_r**2, 0.0)))
    return jnp.where(abs_r <= 1.0, inner, jnp.where(abs_r <= 2.0, outer, 0.0))


def _marker_stencil(positions, shape):
    """Per-marker 4^3 stencil: linear cell ids (n, 64) and Peskin weights
    (n, 64).  Cell centers sit at integer coordinates (voxel units).
    Reference oracle for the factored path (kept for parity tests)."""
    n = positions.shape[0]
    base = jnp.floor(positions).astype(jnp.int32) - 1  # (n, 3)
    offs = jnp.stack(jnp.meshgrid(*[jnp.arange(4)] * 3, indexing="ij"), axis=-1).reshape(-1, 3)  # (64, 3)
    cells = base[:, None, :] + offs[None, :, :]  # (n, 64, 3)
    dims = jnp.asarray(shape, dtype=jnp.int32)
    # stencil cells outside the domain contribute NOTHING: zero their
    # weights (a wrap here would silently couple a near-edge marker to the
    # opposite face) and clamp the ids only so indexing stays in range
    in_domain = jnp.all((cells >= 0) & (cells < dims[None, None, :]), axis=-1)  # (n, 64)
    cells_c = jnp.clip(cells, 0, dims[None, None, :] - 1)
    r = cells.astype(positions.dtype) - positions[:, None, :]
    w = peskin_weight(r[..., 0]) * peskin_weight(r[..., 1]) * peskin_weight(r[..., 2])  # (n, 64)
    w = jnp.where(in_domain, w, 0.0)
    lin = (cells_c[..., 0] * dims[1] + cells_c[..., 1]) * dims[2] + cells_c[..., 2]  # (n, 64)
    return lin, w


def _spread_to_grid_scatter(values, positions, areas, shape):
    """Scatter-add oracle (slow on TPU; parity reference only)."""
    lin, w = _marker_stencil(positions, shape)
    ncells = int(np.prod(shape))
    wa = w * areas[:, None]  # (n, 64)
    num = jnp.zeros((ncells, values.shape[1]), dtype=values.dtype)
    num = num.at[lin.reshape(-1)].add((wa[..., None] * values[:, None, :]).reshape(-1, values.shape[1]))
    den = jnp.zeros((ncells,), dtype=values.dtype).at[lin.reshape(-1)].add(w.reshape(-1))
    return num, den


def _interpolate_from_grid_gather(field_flat, positions, shape):
    """Gather oracle for the factored interpolation (parity reference)."""
    lin, w = _marker_stencil(positions, shape)
    vals = field_flat[lin]  # (n, 64, c)
    num = jnp.sum(w[..., None] * vals, axis=1)
    den = jnp.sum(w, axis=1)
    return num / jnp.maximum(den, 1e-12)[:, None]


def _axis_weights(offset, extent, pos_axis):
    """(extent, n) Peskin weights phi(grid_coord - x) for one axis; grid
    coords are ``offset + arange(extent)`` (offset may be traced)."""
    coords = offset + jnp.arange(extent, dtype=pos_axis.dtype)
    return peskin_weight(coords[:, None] - pos_axis[None, :])


def _pad_chunks(arr, n_pad, fill):
    if n_pad == 0:
        return arr
    pad = [(0, n_pad)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, pad, constant_values=fill)


def spread_to_grid_window(values, positions, areas, window_shape, offset=(0, 0, 0), chunk=_CHUNK,
                          precision=jax.lax.Precision.HIGHEST):
    """sum_k w_ik A_k value_k and sum_k w_ik over a dense grid window.

    Factored-Peskin spread: per-axis weight matrices contracted by chunked
    einsums (MXU), no scatter.  ``offset`` (static or traced ints) places
    the window in grid coordinates.  Returns ``num (Lx, Ly, Lz, c)`` and
    ``den (Lx, Ly, Lz)``.  Markers whose 4-point support leaves the window
    simply truncate (identical to the no-wrap clamp of the scatter oracle
    when the window covers the domain)."""
    Lx, Ly, Lz = window_shape
    n, c = values.shape
    n_pad = (-n) % chunk
    # padded markers sit far outside any window -> all weights exactly 0
    positions = _pad_chunks(positions, n_pad, -1e9)
    values = _pad_chunks(values, n_pad, 0.0)
    areas = _pad_chunks(areas, n_pad, 0.0)
    payload = jnp.concatenate([values * areas[:, None], jnp.ones_like(areas)[:, None]], axis=1)  # (n', c+1)

    num_den = jnp.zeros((Lx, Ly, Lz, c + 1), dtype=values.dtype)
    for s in range(0, n + n_pad, chunk):
        pos_c = jax.lax.dynamic_slice_in_dim(positions, s, chunk, axis=0)
        pay_c = jax.lax.dynamic_slice_in_dim(payload, s, chunk, axis=0)
        A = _axis_weights(offset[0], Lx, pos_c[:, 0])  # (Lx, m)
        B = _axis_weights(offset[1], Ly, pos_c[:, 1])  # (Ly, m)
        C = _axis_weights(offset[2], Lz, pos_c[:, 2])  # (Lz, m)
        BC = jnp.einsum("jm,km->jkm", B, C, precision=precision)  # (Ly, Lz, m)
        Ap = jnp.einsum("im,mp->imp", A, pay_c, precision=precision)  # (Lx, m, p)
        num_den = num_den + jnp.einsum("jkm,imp->ijkp", BC, Ap, precision=precision)
    return num_den[..., :c], num_den[..., c]


def interpolate_from_grid_window(field, positions, offset=(0, 0, 0), chunk=_CHUNK,
                                 precision=jax.lax.Precision.HIGHEST):
    """Peskin-weighted interpolation of ``field (Lx, Ly, Lz, c)`` at the
    markers (factored dense contraction, partition-of-unity normalized)."""
    Lx, Ly, Lz, c = field.shape
    n = positions.shape[0]
    n_pad = (-n) % chunk
    positions_p = _pad_chunks(positions, n_pad, -1e9)
    outs = []
    for s in range(0, n + n_pad, chunk):
        pos_c = jax.lax.dynamic_slice_in_dim(positions_p, s, chunk, axis=0)
        A = _axis_weights(offset[0], Lx, pos_c[:, 0])
        B = _axis_weights(offset[1], Ly, pos_c[:, 1])
        C = _axis_weights(offset[2], Lz, pos_c[:, 2])
        t1 = jnp.einsum("ijkc,im->jkcm", field, A, precision=precision)
        t2 = jnp.einsum("jkcm,jm->kcm", t1, B, precision=precision)
        num = jnp.einsum("kcm,km->mc", t2, C, precision=precision)  # (m, c)
        den = jnp.einsum("im,jm,km->m", A, B, C, precision=precision)
        outs.append(num / jnp.maximum(den, 1e-12)[:, None])
    return jnp.concatenate(outs, axis=0)[:n]


def spread_to_grid(values, positions, areas, shape):
    """sum_k w_ik A_k value_k  and  sum_k w_ik, as flat (ncells, c) arrays.

    Public flat-signature wrapper over the factored window spread (full
    domain window)."""
    num, den = spread_to_grid_window(values, positions, areas, shape)
    return num.reshape(-1, values.shape[1]), den.reshape(-1)


def interpolate_from_grid(field_flat, positions, shape):
    """Peskin-weighted interpolation of a flat (ncells, c) field at markers."""
    field = field_flat.reshape(tuple(shape) + (field_flat.shape[-1],))
    return interpolate_from_grid_window(field, positions)


class IBMStepper(IncompressibleNavierStokesStepper):
    """NSE stepper with immersed-boundary coupling.

    Call signature (parity with reference ibm_stepper.py:380-393)::

        f_0, f_1, lagr_forces = stepper(
            f_0, f_1, vertices, areas, velocities,
            bc_mask, missing_mask, omega, timestep)

    ``ibm_window``: optional static (Lx, Ly, Lz) extents of the dense
    transfer window.  The window's offset follows min(vertices) each call
    (clamped to the domain), so a rigid body moving through a large grid
    pays the factored-transfer cost of the window volume, not the domain.
    The window must contain every marker's 4-point support (extent >=
    marker AABB + 4); with ``None`` the full domain is the window.

    ``ibm_transfer``: ``"dense"`` (factored-Peskin MXU einsums),
    ``"scatter"`` (scatter-add/gather, the oracle), or ``"auto"``
    (default): dense on accelerators -- TPU scatter serializes per update
    -- and scatter on CPU, where dense FLOPs have no MXU to run on and
    scatter is cheap.
    """

    def __init__(
        self,
        grid,
        boundary_conditions=(),
        collision_type="BGK",
        ibm_max_iterations=4,
        ibm_tolerance=1e-5,  # accepted for parity; fixed iterations are used
        ibm_relaxation=1.0,
        ibm_window=None,
        ibm_transfer="auto",
        **kwargs,
    ):
        super().__init__(grid, boundary_conditions, collision_type=collision_type, **kwargs)
        self.ibm_max_iterations = int(ibm_max_iterations)
        self.ibm_tolerance = float(ibm_tolerance)
        self.ibm_relaxation = float(ibm_relaxation)
        if ibm_window is not None:
            ibm_window = tuple(int(min(w, s)) for w, s in zip(ibm_window, grid.shape))
        self.ibm_window = ibm_window
        assert ibm_transfer in ("auto", "dense", "scatter")
        if ibm_transfer == "auto":
            ibm_transfer = "scatter" if jax.default_backend() == "cpu" else "dense"
        self.ibm_transfer = ibm_transfer

    def _window_offset(self, vertices):
        """Dynamic window origin: floor(min(pos)) - 2, clamped so the
        static-extent window stays inside the domain."""
        lo = jnp.floor(jnp.min(vertices, axis=0)).astype(jnp.int32) - 2
        hi = jnp.asarray(self.grid.shape, jnp.int32) - jnp.asarray(self.ibm_window, jnp.int32)
        return tuple(jnp.clip(lo[a], 0, hi[a]) for a in range(3))

    def __call__(self, f_0, f_1, vertices, areas, velocities, bc_mask, missing_mask, omega, timestep=0):
        shape = self.grid.shape
        vs = self.velocity_set
        pp = self.precision_policy

        # 1. plain NSE step
        f_0, f_1 = super().__call__(f_0, f_1, bc_mask, missing_mask, omega, timestep)

        # 2. iterative direct forcing toward the solid velocity, computed
        #    on the marker window only
        window = self.ibm_window or tuple(shape)
        cdt = pp.compute_dtype
        vertices = vertices.astype(cdt)
        velocities = velocities.astype(cdt)
        areas = areas.astype(cdt)
        offset = self._window_offset(vertices) if self.ibm_window else (0, 0, 0)

        f_1c = pp.cast_to_compute(f_1)
        fw = jax.lax.dynamic_slice(f_1c, (0,) + offset, (vs.q,) + window)
        mac = Macroscopic(vs, pp, self.compute_backend)
        rho_w, u_w = mac(fw)  # (1, L...), (3, L...)
        u_win = jnp.moveaxis(u_w, 0, -1)  # (Lx, Ly, Lz, 3)

        off_f = jnp.stack([jnp.asarray(o, cdt) for o in offset])
        v_loc = vertices - off_f[None, :]  # window-local marker coords (scatter path)

        def body(_, carry):
            forces, correction = carry
            u_corr = u_win + correction
            if self.ibm_transfer == "dense":
                u_interp = interpolate_from_grid_window(u_corr, vertices, offset)
                forces = forces + (velocities - u_interp)
                num, den = spread_to_grid_window(forces, vertices, areas, window, offset)
            else:
                u_interp = _interpolate_from_grid_gather(u_corr.reshape(-1, vs.d), v_loc, window)
                forces = forces + (velocities - u_interp)
                num_f, den_f = _spread_to_grid_scatter(forces, v_loc, areas, window)
                num, den = num_f.reshape(tuple(window) + (vs.d,)), den_f.reshape(window)
            target = num / jnp.maximum(den, 1e-12)[..., None]
            correction = jnp.where((den > 0.0)[..., None], cdt(self.ibm_relaxation) * (target - u_win), 0.0)
            return forces, correction

        forces0 = jnp.zeros_like(vertices)
        corr0 = jnp.zeros_like(u_win)
        # unroll the multi-direct iterations: as a lax.fori_loop (while-op)
        # the chunked transfer einsums serialize behind the loop barrier --
        # measured 42 ms/iteration vs ~sub-ms unrolled at 82k markers on a
        # 70^3 window (XLA fuses and latency-hides the unrolled chain)
        forces, correction = forces0, corr0
        for i in range(self.ibm_max_iterations):
            forces, correction = body(i, (forces, correction))

        # 3. apply the Eulerian correction to the populations via the
        #    exact-difference of equilibria (reference correct_population_ibm)
        #    -- only the window slab of f_1 changes
        corr_cf = jnp.moveaxis(correction, -1, 0)  # (3, Lx, Ly, Lz)
        feq = quadratic_equilibrium(rho_w, u_w, vs._c, vs._w, self.compute_dtype)
        feq_force = quadratic_equilibrium(rho_w, u_w + corr_cf, vs._c, vs._w, self.compute_dtype)
        fw = fw + (feq_force - feq)
        f_1 = jax.lax.dynamic_update_slice(pp.cast_to_store(f_1c), fw.astype(self.store_dtype), (0,) + offset)

        return f_0, f_1, forces
