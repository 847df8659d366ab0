"""Multi-resolution level-layout helpers.

Parity surface with reference xlb/utils/mesher.py (make_cuboid_mesh,
MultiresIO): builds the nested refinement boxes around a geometry and
exports per-level fields.  The reference emits sparse mGrid masks +
HDF5/XDMF; here levels are dense cuboids (grid/multires.py) and export uses
the dependency-free VTK writer.
"""

import os

import numpy as np

from xlb_tpu.grid.multires import MultiresGrid
from xlb_tpu.utils.io import write_vti


def make_cuboid_mesh(domain_shape, geometry_bbox, level_multipliers=(1.5, 2.5), align=8):
    """Nested refinement boxes around a geometry (reference mesher.py:63-162).

    Parameters
    ----------
    domain_shape : tuple
        FINEST-level extents of the whole domain (must be divisible by
        2^levels so every level has integral shape).
    geometry_bbox : ((lo...), (hi...))
        Geometry bounds in finest-level cells.
    level_multipliers : sequence of float, innermost first
        Half-extent multipliers of each refinement box relative to the
        geometry's half extents; ``len(level_multipliers)`` fine levels are
        created (total levels = len + 1).
    align : int
        Box origins/extents are rounded to this many cells of their level.

    Returns
    -------
    MultiresGrid
    """
    dim = len(domain_shape)
    n_fine = len(level_multipliers)
    levels_total = n_fine + 1
    for s in domain_shape:
        if s % (2**n_fine):
            raise ValueError(f"domain extent {s} not divisible by 2^{n_fine}")

    lo = np.asarray(geometry_bbox[0], dtype=np.float64)
    hi = np.asarray(geometry_bbox[1], dtype=np.float64)
    center = 0.5 * (lo + hi)
    half = 0.5 * (hi - lo)

    # build boxes outermost-first as (origin, extent) in the LOCAL coords of
    # the level each box refines (MultiresGrid convention); the parent
    # array's global origin (in finest units) accumulates as we descend
    boxes = []
    coarsest_shape = tuple(s // 2**n_fine for s in domain_shape)
    parent_origin_finest = np.zeros(dim)
    parent_shape = np.asarray(coarsest_shape)
    parent_scale = 2**n_fine  # finest cells per parent cell
    for mult in reversed(level_multipliers):
        lo_local = (center - mult * half - parent_origin_finest) / parent_scale
        hi_local = (center + mult * half - parent_origin_finest) / parent_scale
        origin = np.clip((np.floor(lo_local / align) * align).astype(int), 0, None)
        end = np.minimum(parent_shape, (np.ceil(hi_local / align) * align).astype(int))
        extent = np.maximum(align, end - origin)
        extent = np.minimum(extent, parent_shape - origin)
        boxes.append((tuple(origin), tuple(extent)))
        parent_origin_finest = parent_origin_finest + origin * parent_scale
        parent_shape = 2 * extent
        parent_scale //= 2
    return MultiresGrid(coarsest_shape, boxes=boxes)


class MultiresIO:
    """Per-level field export (parity surface with reference
    mesher.py:164-943 MultiresIO: HDF5/XDMF there, .vti per level here,
    plus slice images and line probes)."""

    def __init__(self, grid: MultiresGrid, output_dir="."):
        self.grid = grid
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)

    def export_macroscopic(self, sim_manager, timestep=0, prefix="mres"):
        paths = []
        for level, (rho, u) in enumerate(sim_manager.export_macroscopic()):
            spacing = 2.0**level
            lvl = self.grid.levels[level]
            origin = (0.0, 0.0, 0.0)
            if lvl.origin_in_parent is not None:
                # physical origin in coarsest units: accumulate box offsets
                off = np.zeros(self.grid.dim)
                scale = spacing
                for li in range(level, self.grid.num_levels - 1):
                    parent_scale = 2.0 ** (li + 1)
                    off += np.asarray(self.grid.levels[li].origin_in_parent) * parent_scale
                    scale = parent_scale
                origin = tuple(off[: self.grid.dim])
            path = os.path.join(self.output_dir, f"{prefix}_L{level}_{timestep:07d}.vti")
            write_vti(path, {"rho": rho, "u": u}, spacing=(spacing,) * 3, origin=tuple(origin) + (0,) * (3 - len(origin)))
            paths.append(path)
        return paths

    def line_probe(self, sim_manager, level, axis, index=None):
        """1-D profile of (rho, u) along ``axis``; the orthogonal position
        defaults to the level midplane (reference mesher.py:808-...)."""
        rho, u = sim_manager.export_macroscopic()[level]
        dim = rho.ndim - 1
        if index is None:
            index = [s // 2 for s in rho.shape[1:]]
        slicer = tuple(slice(None) if d == axis else int(index[d]) for d in range(dim))
        return rho[(0, *slicer)], u[(slice(None), *slicer)]
