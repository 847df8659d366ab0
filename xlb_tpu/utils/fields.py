"""Field post-processing utilities (reference xlb/utils/utils.py:28-56,
219-246, 540-633): downsampling for image/export pipelines, voxel-index
rotation for moving-geometry setups, and colormap application.

Convention delta: xlb_tpu fields are channel-FIRST ``(cardinality, x,
y[, z])`` (the reference is channel-last); ``downsample_field`` follows
the xlb_tpu convention.
"""

import numpy as np
import jax.numpy as jnp


def downsample_field(field, factor, method="cubic"):
    """Downsample a (cardinality, *spatial) field by ``factor`` along every
    spatial axis (reference utils.py:28-56; 'bicubic' there == 'cubic' in
    jax.image).  factor=1 is a no-op."""
    if factor == 1:
        return field
    from jax.image import resize

    if method == "bicubic":
        method = "cubic"
    new_shape = (field.shape[0],) + tuple(dim // factor for dim in field.shape[1:])
    return resize(field, new_shape, method=method)


def axangle2mat(axis, angle, is_normalized=False):
    """Rotation matrix from an axis-angle pair (reference utils.py:286-328,
    Rodrigues form)."""
    x, y, z = np.asarray(axis, dtype=np.float64)
    if not is_normalized:
        n = np.sqrt(x * x + y * y + z * z)
        x, y, z = x / n, y / n, z / n
    c, s = np.cos(angle), np.sin(angle)
    C = 1.0 - c
    return np.array(
        [
            [x * x * C + c, x * y * C - z * s, x * z * C + y * s],
            [y * x * C + z * s, y * y * C + c, y * z * C - x * s],
            [z * x * C - y * s, z * y * C + x * s, z * z * C + c],
        ]
    )


def rotate_geometry(indices, origin, axis, angle):
    """Rotate voxel indices around an axis through ``origin`` by ``angle``
    radians; returns a (d, n) integer index tuple (reference
    utils.py:219-246).  Useful for rigid-body moving geometry expressed as
    BC index lists."""
    idx = np.asarray(indices, dtype=np.float64).T  # (n, d)
    origin = np.asarray(origin, dtype=np.float64)
    rotated = (idx - origin) @ axangle2mat(axis, angle) + origin
    return tuple(np.rint(rotated).astype(np.int32).T)


def colorize_scalars(scalars, value_range=None, percentiles=(5, 95), cmap="viridis"):
    """Map a scalar array to (n, 3) float RGB in [0, 1] (reference
    utils.py:540-633 get_color/colorize_scalars, minus the torch/device
    plumbing).  ``value_range`` overrides the percentile-based robust
    normalization."""
    vals = np.asarray(scalars, dtype=np.float64).reshape(-1)
    finite = vals[np.isfinite(vals)]
    if value_range is not None:
        lo, hi = value_range
    elif finite.size:
        lo, hi = np.percentile(finite, percentiles)
    else:
        lo, hi = 0.0, 1.0
    if hi <= lo:
        hi = lo + 1.0
    t = np.clip(np.nan_to_num((vals - lo) / (hi - lo)), 0.0, 1.0)
    try:
        import matplotlib
    except ImportError:
        # dependency-free fallback gradient blue -> red
        return np.stack([t, 0.2 * np.ones_like(t), 1.0 - t], axis=1)
    return np.asarray(matplotlib.colormaps[cmap](t))[:, :3]
