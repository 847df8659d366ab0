"""Minimal STL reader/writer (binary and ASCII) -- no trimesh dependency.

The reference leans on trimesh + Warp BVH for geometry handling
(utils/utils.py:248-338); here STL parsing is ~40 lines of NumPy and
voxelization happens in xlb_tpu.geometry.voxelize.
"""

import struct

import numpy as np


def load_stl(path):
    """Load an STL file; returns triangle vertices of shape (n_tri, 3, 3)."""
    with open(path, "rb") as f:
        header = f.read(5)
        f.seek(0)
        if header[:5] == b"solid":
            # could still be binary with a 'solid' header; try ASCII first
            try:
                return _load_ascii(path)
            except ValueError:
                pass
        return _load_binary(f)


def _load_binary(f):
    f.seek(80)
    (n_tri,) = struct.unpack("<I", f.read(4))
    data = np.frombuffer(f.read(n_tri * 50), dtype=np.uint8)
    if data.size != n_tri * 50:
        raise ValueError("truncated binary STL")
    rec = data.reshape(n_tri, 50)
    floats = rec[:, :48].copy().view("<f4").reshape(n_tri, 4, 3)
    return floats[:, 1:4, :].astype(np.float64)  # drop the normal row


def _load_ascii(path):
    tris, current = [], []
    with open(path, "r", errors="ignore") as f:
        for line in f:
            parts = line.split()
            if parts[:1] == ["vertex"]:
                current.append([float(x) for x in parts[1:4]])
                if len(current) == 3:
                    tris.append(current)
                    current = []
    if not tris:
        raise ValueError("no triangles found in ASCII STL")
    return np.asarray(tris, dtype=np.float64)


def save_stl(path, triangles):
    """Write (n_tri, 3, 3) triangles as binary STL."""
    triangles = np.asarray(triangles, dtype=np.float32)
    n = triangles.shape[0]
    e1 = triangles[:, 1] - triangles[:, 0]
    e2 = triangles[:, 2] - triangles[:, 0]
    normals = np.cross(e1, e2)
    lens = np.linalg.norm(normals, axis=1, keepdims=True)
    normals = np.where(lens > 0, normals / np.maximum(lens, 1e-30), 0.0).astype(np.float32)
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", n))
        for i in range(n):
            f.write(normals[i].tobytes())
            f.write(triangles[i].tobytes())
            f.write(b"\0\0")
    return path


def transform_mesh(triangles, scale=1.0, rotation=None, translation=(0.0, 0.0, 0.0)):
    """Scale/rotate/translate triangles (reference helper/ibm_helper.py:27-75).

    ``rotation`` is an optional (3, 3) matrix applied after scaling.
    """
    tris = np.asarray(triangles, dtype=np.float64) * float(scale)
    if rotation is not None:
        tris = tris @ np.asarray(rotation, dtype=np.float64).T
    return tris + np.asarray(translation, dtype=np.float64)


def rotation_matrix(axis, angle_deg):
    """Rodrigues rotation matrix around ``axis`` by ``angle_deg`` degrees
    (reference utils.py:219-246 rotate_geometry)."""
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    a = np.deg2rad(angle_deg)
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K)


def sphere_triangles(center=(0.0, 0.0, 0.0), radius=1.0, subdivisions=3):
    """Generate a triangulated sphere (icosphere) -- used by tests/examples."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        dtype=np.float64,
    )
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ]
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    for _ in range(subdivisions):
        new_faces = []
        midpoint_cache = {}
        verts_list = list(verts)

        def midpoint(i, j):
            key = (min(i, j), max(i, j))
            if key not in midpoint_cache:
                m = verts_list[i] + verts_list[j]
                m /= np.linalg.norm(m)
                verts_list.append(m)
                midpoint_cache[key] = len(verts_list) - 1
            return midpoint_cache[key]

        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.asarray(verts_list)
        faces = np.asarray(new_faces)
    pts = verts * radius + np.asarray(center)
    return pts[faces]
