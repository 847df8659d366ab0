"""Boundary-masker tests (strategy per reference
tests/boundary_conditions/mask/test_bc_indices_masker_jax.py:31-60)."""

import numpy as np
import jax.numpy as jnp

from tests.conftest import init_env
from xlb_tpu.velocity_set import D2Q9, D3Q19
from xlb_tpu.grid import grid_factory
from xlb_tpu.helper import create_nse_fields
from xlb_tpu.boundary import FullwayBounceBackBC, HalfwayBounceBackBC, IndicesBoundaryMasker
import pytest



@pytest.mark.fast
def test_domain_boundary_masker_2d():
    vs = init_env(D2Q9)
    grid = grid_factory((16, 16))
    _, f0, f1, missing_mask, bc_mask = create_nse_fields(grid=grid)

    walls = grid.bounding_box_indices()
    wall_idx = np.concatenate([np.asarray(walls[k]) for k in ("bottom", "left", "right")], axis=1)
    wall_idx = np.unique(wall_idx, axis=1)
    bc = FullwayBounceBackBC(indices=wall_idx.tolist())

    masker = IndicesBoundaryMasker(grid=grid)
    bc_mask, missing_mask = masker([bc], bc_mask, missing_mask)
    bc_mask_np = np.asarray(bc_mask)[0]
    miss_np = np.asarray(missing_mask)

    # id assigned exactly at given indices
    tagged = np.zeros((16, 16), dtype=bool)
    tagged[tuple(wall_idx)] = True
    assert (bc_mask_np == bc.id).sum() == tagged.sum()
    assert ((bc_mask_np == bc.id) == tagged).all()

    # bottom-edge voxel (5, 0): direction l is missing iff its pull source
    # (5, 0) - c_l lies outside the domain, i.e. c_y = +1 (populations
    # moving up, away from the wall, are the unknown ones)
    for l in range(vs.q):
        cy = vs._c[1, l]
        assert miss_np[l, 5, 0] == (cy == 1)
    # interior voxel has no missing directions
    assert not miss_np[:, 8, 8].any()


def test_interior_geometry_masker_3d():
    """A solid discrete sphere in the interior: given indices are solid; the
    dilated shell is tagged; missing dirs point into the solid."""
    vs = init_env(D3Q19)
    grid = grid_factory((16, 16, 16))
    _, f0, f1, missing_mask, bc_mask = create_nse_fields(grid=grid)

    x, y, z = np.meshgrid(*[np.arange(16)] * 3, indexing="ij")
    inside = (x - 8) ** 2 + (y - 8) ** 2 + (z - 8) ** 2 <= 9
    sphere_idx = np.array(np.nonzero(inside))
    bc = HalfwayBounceBackBC(indices=sphere_idx.tolist())

    masker = IndicesBoundaryMasker(grid=grid)
    bc_mask, missing_mask = masker([bc], bc_mask, missing_mask)
    bc_np = np.asarray(bc_mask)[0]
    miss_np = np.asarray(missing_mask)

    # solid voxels are tagged BC_SOLID=255 (reference Warp masker,
    # indices_boundary_masker.py:166-172) so steppers freeze them; the
    # dilated fluid shell carries the BC id
    assert (bc_np[tuple(sphere_idx)] == 255).all()
    assert (bc_np == bc.id).sum() > 0
    shell = bc_np == bc.id
    sx, sy, sz = np.nonzero(shell)
    assert not inside[sx, sy, sz].any()  # shell is outside the solid

    # a voxel just above the sphere pole (8, 8, 12): the pull direction with
    # c_z = +1... voxel (8,8,12) is outside (dist 16 > 9); its -z neighbour
    # (8,8,11) is inside -> direction with c = (0,0,+1) is missing
    l_up = int(np.nonzero((vs._c[0] == 0) & (vs._c[1] == 0) & (vs._c[2] == 1))[0][0])
    assert miss_np[l_up, 8, 8, 12]
    # far-away voxel clean
    assert not miss_np[:, 2, 2, 2].any()
