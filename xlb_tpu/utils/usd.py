"""OpenUSD (.usda) exporters for in-situ visualization.

Parity surface with reference xlb/utils/utils.py:723-1046
(save_usd_vorticity / save_usd_q_criterion / update_usd_lagrangian_parts,
which require the pxr/Omniverse stack).  Here the ASCII ``.usda`` format is
emitted directly -- no dependencies -- loadable in usdview/Omniverse/Blender:

- meshes (geometry surfaces, Lagrangian parts) as ``UsdGeomMesh``,
- thresholded scalar fields (vorticity magnitude, Q-criterion) as colored
  ``UsdGeomPoints`` clouds.
"""

import numpy as np


def _colormap(values, cmap="viridis"):
    values = np.asarray(values, dtype=np.float64)
    lo, hi = float(values.min()), float(values.max())
    t = (values - lo) / (hi - lo) if hi > lo else np.zeros_like(values)
    try:
        import matplotlib

        return matplotlib.colormaps[cmap](t)[:, :3]
    except Exception:
        # fallback gradient blue->red
        return np.stack([t, 0.2 * np.ones_like(t), 1.0 - t], axis=1)


def _fmt_vecs(arr):
    return ", ".join(f"({v[0]:.6g}, {v[1]:.6g}, {v[2]:.6g})" for v in arr)


def save_usd_mesh(path, triangles, color=(0.8, 0.8, 0.8), prim_name="mesh"):
    """Write (n, 3, 3) triangles as a UsdGeomMesh."""
    tris = np.asarray(triangles, dtype=np.float64).reshape(-1, 3, 3)
    verts = tris.reshape(-1, 3)
    counts = ", ".join(["3"] * len(tris))
    indices = ", ".join(str(i) for i in range(len(verts)))
    with open(path, "w") as f:
        f.write("#usda 1.0\n")
        f.write(f'def Mesh "{prim_name}" {{\n')
        f.write(f"    int[] faceVertexCounts = [{counts}]\n")
        f.write(f"    int[] faceVertexIndices = [{indices}]\n")
        f.write(f"    point3f[] points = [{_fmt_vecs(verts)}]\n")
        f.write(f"    color3f[] primvars:displayColor = [({color[0]}, {color[1]}, {color[2]})]\n")
        f.write("}\n")
    return path


def save_usd_points(path, points, values=None, cmap="viridis", width=0.5, prim_name="points"):
    """Write a colored point cloud as UsdGeomPoints."""
    points = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    with open(path, "w") as f:
        f.write("#usda 1.0\n")
        f.write(f'def Points "{prim_name}" {{\n')
        f.write(f"    point3f[] points = [{_fmt_vecs(points)}]\n")
        f.write(f"    float[] widths = [{', '.join([str(width)] * len(points))}]\n")
        if values is not None:
            colors = _colormap(values, cmap)
            f.write(f"    color3f[] primvars:displayColor = [{_fmt_vecs(colors)}] (interpolation = \"vertex\")\n")
        f.write("}\n")
    return path


def _thresholded_points(field, threshold):
    field = np.asarray(field)
    if field.ndim == 4:
        field = field[0]
    idx = np.argwhere(field > threshold)
    return idx.astype(np.float64), field[tuple(idx.T)]


def save_usd_q_criterion(path, u, threshold=1e-6, cmap="inferno", **kwargs):
    """Voxel centers where Q > threshold, colored by Q (reference
    utils.py:834-952)."""
    from xlb_tpu.ops.postprocess import q_criterion

    q = np.asarray(q_criterion(u))
    pts, vals = _thresholded_points(q, threshold)
    if len(pts) == 0:
        raise ValueError(f"no voxels exceed Q-criterion threshold {threshold}")
    return save_usd_points(path, pts, vals, cmap=cmap, **kwargs)


def save_usd_vorticity(path, u, threshold=1e-4, cmap="viridis", **kwargs):
    """Voxel centers where |curl u| > threshold, colored by magnitude
    (reference utils.py:723-833)."""
    from xlb_tpu.ops.postprocess import vorticity_magnitude

    w = np.asarray(vorticity_magnitude(u))
    pts, vals = _thresholded_points(w, threshold)
    if len(pts) == 0:
        raise ValueError(f"no voxels exceed vorticity threshold {threshold}")
    return save_usd_points(path, pts, vals, cmap=cmap, **kwargs)


def update_usd_lagrangian_parts(path, vertices, values=None, cmap="plasma", **kwargs):
    """Export Lagrangian marker positions (IBM parts) as a point cloud
    (reference utils.py:953-1046)."""
    return save_usd_points(path, vertices, values, cmap=cmap, **kwargs)
