"""Multi-chip execution of the fused multires tier (kernel-island shard_map).

The multires stepper's level-coupling -- explosion gathers, coalescence
averages, ring-face overlays, and any jnp-tier levels -- is pure jnp and
already distributes under GSPMD (tests/parallel/test_gspmd_models.py): XLA
inserts the collectives for the refinement-boundary gathers that straddle
shard cuts, which was the complication that kept the fused tier
single-chip (docs/architecture.md).  What GSPMD cannot partition is a
``pallas_call`` over a sharded array, so this module makes the fused tier
mesh-capable by wrapping each CTS-family kernel in its own shard_map
island:

- the kernel is BUILT for the shard-local padded shape
  ``(Xl + 2*hx, Yl + 2*hy, Ze)`` (models/multires.py picks rings and pads
  so every extent divides both the mesh and the kernel tile);
- inside the island each shard embeds its slice into a padded buffer whose
  pad layers are refreshed by ring ``lax.ppermute`` exchanges at the
  kernel's true pull depth: 2 for the finest PAIR kernel (it is a k=2
  temporal block -- sub-step B pulls sub-step A values recomputed one cell
  into the pads, which themselves pulled inputs one cell deeper), 1 for
  the single-sub-step coarsest/middle kernels.  Masks ride the same
  exchange so the halo-recomputed sub-step applies the neighbor's BCs;
- pad cells beyond the exchanged depth carry packed cell-type 30 and the
  storage-form equilibrium background (zero deviation when ``shifted``),
  so the kernel's ring keep makes them inert -- no NaNs, no reads of
  uninitialized data that could reach an interior output;
- the island returns only the interior slice, so from GSPMD's point of
  view each wrapped kernel is an elementwise-sharded op with the same
  global signature as its single-chip counterpart.

Axes with a single shard wrap locally (periodic semantics preserved, same
convention as parallel/pallas_distribute.py); the COARSEST level's kernel
relies on this to realize global periodic streaming across shard cuts.

Reference counterpart: the Neon multi-GPU multires runtime
(nse_multires_stepper.py:540-1110 driven through mGrid halo exchange) --
the reference's crown-jewel capability, rebuilt here from GSPMD
primitives instead of a C++ sparse-grid library.
"""

import numpy as np
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from xlb_tpu.kernels.fused_step import ring_val as _ring_val
from xlb_tpu.parallel.pallas_distribute import _ring_perms


def pad_for(extent_local, tile, depth):
    """Smallest in-shard pad ``h >= depth`` making ``extent_local + 2*h``
    divisible by ``tile`` (None when the parities cannot meet)."""
    for h in range(max(depth, 1), max(depth, 1) + tile):
        if (extent_local + 2 * h) % tile == 0:
            return h
    return None


def ring_for_sharded(extent, parts, depth=2, limit=None):
    """Smallest ghost-ring width ``g >= depth`` such that the extended
    extent ``extent + 2*g`` divides evenly over ``parts`` shards AND the
    local extent is even (a kernel-tile pad exists for any even tile)."""
    limit = limit if limit is not None else 2 * parts * 8 + depth
    for g in range(depth, limit + 1):
        ext = extent + 2 * g
        if ext % parts == 0 and (ext // parts) % 2 == 0:
            return g
    return None


def wrap_cts_sharded(
    kernel,
    *,
    mesh,
    axis_names,
    q,
    global_shape,
    pads,
    depth,
    shifted,
    weights,
):
    """shard_map a CTS-family kernel built for the LOCAL padded shape.

    ``kernel(g_local, mask_local, omega) -> g_local'`` operates on
    ``(q, Xl + 2*hx, Yl + 2*hy, Ze)`` arrays; the returned callable has the
    single-chip signature ``(f_global, mask_global, omega) -> f_global'``
    over ``(q,) + global_shape`` arrays sharded on ``axis_names``.
    ``weights`` is the lattice-weight vector; pads beyond the exchanged
    depth hold the storage-form equilibrium (w, or zero deviation when
    ``shifted``) under packed cell-type 30.
    """
    ax, ay = axis_names
    px, py = mesh.shape[ax], mesh.shape[ay]
    Xe, Ye, Ze = global_shape
    assert Xe % px == 0 and Ye % py == 0, f"global {global_shape[:2]} must divide mesh ({px}, {py})"
    Xl, Yl = Xe // px, Ye // py
    hx, hy = pads
    assert hx >= depth and hy >= depth, f"pads {pads} must cover pull depth {depth}"
    x_fwd, x_bwd = _ring_perms(px)
    y_fwd, y_bwd = _ring_perms(py)

    if shifted:
        bg = np.zeros((q, 1, 1, 1), dtype=np.float32)
    else:
        bg = np.asarray(weights, dtype=np.float32).reshape(q, 1, 1, 1)

    def _exchange(g, d, axis):
        pad, nloc, n_parts = (hx, Xl, px) if axis == 1 else (hy, Yl, py)
        fwd, bwd = (x_fwd, x_bwd) if axis == 1 else (y_fwd, y_bwd)
        name = ax if axis == 1 else ay
        lo_send = lax.slice_in_dim(g, pad, pad + d, axis=axis)
        hi_send = lax.slice_in_dim(g, pad + nloc - d, pad + nloc, axis=axis)
        if n_parts > 1:
            from_prev = lax.ppermute(hi_send, perm=fwd, axis_name=name)
            from_next = lax.ppermute(lo_send, perm=bwd, axis_name=name)
        else:  # single shard: periodic wrap stays local
            from_prev, from_next = hi_send, lo_send
        idx_lo = [0] * g.ndim
        idx_lo[axis] = pad - d
        g = lax.dynamic_update_slice(g, from_prev, tuple(idx_lo))
        idx_hi = [0] * g.ndim
        idx_hi[axis] = pad + nloc
        return lax.dynamic_update_slice(g, from_next, tuple(idx_hi))

    def local_fn(f_loc, m_loc, omega):
        g = jnp.broadcast_to(
            jnp.asarray(bg, f_loc.dtype), (q, Xl + 2 * hx, Yl + 2 * hy, Ze)
        )
        g = lax.dynamic_update_slice(g, f_loc, (0, hx, hy, 0))
        g = _exchange(_exchange(g, depth, 1), depth, 2)
        m = jnp.full((Xl + 2 * hx, Yl + 2 * hy, Ze), _ring_val(q), jnp.int32)
        m = lax.dynamic_update_slice(m, m_loc, (hx, hy, 0))
        m = _exchange(_exchange(m[None], depth, 1), depth, 2)[0]
        out = kernel(g, m, omega)
        return lax.dynamic_slice(out, (0, hx, hy, 0), (q, Xl, Yl, Ze))

    fspec = P(None, ax, ay, None)
    mspec = P(ax, ay, None)
    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(fspec, mspec, P()),
        out_specs=fspec,
        # pallas_call out_shapes carry no varying-mesh-axes info
        check_vma=False,
    )
