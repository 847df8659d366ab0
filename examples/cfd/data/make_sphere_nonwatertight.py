"""Generator for sphere_nonwatertight.stl (checked-in asset).

A deliberately BROKEN triangle soup -- the real-world STL pathology the
WINDING voxelizer exists for (reference boundary_masker/winding.py:20:
"robust to non-watertight geometry"):

- 4% of faces DELETED (open holes in the shell),
- 3% of faces DUPLICATED (double-counted area),
- 3% of faces with FLIPPED orientation (inconsistent normals).

Ray-parity voxelizers miscount crossings through holes/duplicates; the
generalized winding number stays ~1 inside and ~0 outside as long as the
defects are a small fraction of the solid angle, so WINDING recovers the
correct solid mask (asserted in tests/boundary/test_geometry.py and
exercised end-to-end by examples/cfd/sphere_drag_validation.py).

Deterministic (seeded); re-run to regenerate the asset:

    python examples/cfd/data/make_sphere_nonwatertight.py
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[3]))

from xlb_tpu.geometry import sphere_triangles
from xlb_tpu.geometry.stl import save_stl


def make_nonwatertight_sphere(radius=1.0, subdivisions=3, seed=7):
    tris = sphere_triangles(center=(0.0, 0.0, 0.0), radius=radius, subdivisions=subdivisions)
    rng = np.random.default_rng(seed)
    n = tris.shape[0]
    order = rng.permutation(n)
    n_del, n_dup, n_flip = int(0.04 * n), int(0.03 * n), int(0.03 * n)
    deleted = order[:n_del]
    duplicated = order[n_del : n_del + n_dup]
    flipped = order[n_del + n_dup : n_del + n_dup + n_flip]

    keep = np.ones(n, bool)
    keep[deleted] = False
    out = tris[keep]
    out = np.concatenate([out, tris[duplicated]], axis=0)
    flip_rows = tris[flipped][:, ::-1, :]  # reverse winding order
    out = np.concatenate([out, flip_rows], axis=0)
    return out


if __name__ == "__main__":
    tris = make_nonwatertight_sphere()
    path = pathlib.Path(__file__).parent / "sphere_nonwatertight.stl"
    save_stl(path, tris)
    print(f"wrote {path}: {tris.shape[0]} triangles (holes + duplicates + flipped normals)")
