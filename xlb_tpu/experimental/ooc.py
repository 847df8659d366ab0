"""Out-of-core execution: domains bigger than device HBM.

TPU-native counterpart of the reference's experimental OOC subsystem
(xlb/experimental/ooc/{out_of_core.py,ooc_array.py}): there, CuPy tile
rings with pinned host buffers and optional MPI stream GPU-sized tiles
through the device.  Here the domain lives in host RAM as a NumPy array
split into x-slabs with ghost layers; :func:`ooc_map` streams each padded
slab through the device function and writes back the valid interior.

A sweep with ghost width ``g`` advances ``g`` LBM steps per host<->device
round trip (the pull stencil consumes one ghost layer per step), amortizing
PCIe/tunnel transfers -- the same trick as the reference's
``padding``/sub-stepping (ooc_array.py ghost machinery).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


class OOCArray:
    """A host-RAM-resident field logically split into tiles along one
    spatial axis (parity surface with reference ooc_array.py:15-440).

    Parameters
    ----------
    shape : tuple
        Global field shape, e.g. ``(q, X, Y, Z)``.
    dtype : numpy dtype
    tile_axis : int
        Axis to slab (default 1 = x).
    num_tiles : int
    """

    def __init__(self, shape, dtype=np.float32, tile_axis=1, num_tiles=1, fill_value=None):
        self.shape = tuple(shape)
        self.tile_axis = int(tile_axis)
        self.num_tiles = int(num_tiles)
        extent = self.shape[self.tile_axis]
        if extent % self.num_tiles:
            raise ValueError(f"axis extent {extent} not divisible into {num_tiles} tiles")
        self.tile_extent = extent // self.num_tiles
        self.data = (
            np.full(self.shape, fill_value, dtype=dtype) if fill_value is not None else np.zeros(self.shape, dtype=dtype)
        )

    @classmethod
    def from_array(cls, array, tile_axis=1, num_tiles=1):
        array = np.asarray(array)
        out = cls(array.shape, array.dtype, tile_axis, num_tiles)
        out.data[...] = array
        return out

    def padded_tile(self, i, ghost):
        """Tile ``i`` with ``ghost`` wrap-around layers on the tiled axis."""
        ax = self.tile_axis
        start = i * self.tile_extent - ghost
        idx = (np.arange(start, start + self.tile_extent + 2 * ghost)) % self.shape[ax]
        return np.take(self.data, idx, axis=ax)

    def write_tile(self, i, tile_interior):
        ax = self.tile_axis
        sl = [slice(None)] * len(self.shape)
        sl[ax] = slice(i * self.tile_extent, (i + 1) * self.tile_extent)
        self.data[tuple(sl)] = np.asarray(tile_interior)

    def to_numpy(self):
        return self.data


def ooc_map(fn, ooc_arrays, ghost=1, out_index=0):
    """Run ``fn`` tile-by-tile over padded tiles of the given OOCArrays
    (parity surface with the reference's OOCmap decorator,
    out_of_core.py:12-110).

    ``fn(*padded_tiles) -> padded_out`` must be jittable; the valid interior
    of its output (ghost layers stripped on the tiled axis) is written back
    to ``ooc_arrays[out_index]``.  Outputs land in a fresh host buffer so
    tiles always read the pre-sweep state of their neighbors.
    """
    lead = ooc_arrays[out_index]
    out_host = np.empty_like(lead.data)
    jfn = jax.jit(fn)
    ax = lead.tile_axis
    for i in range(lead.num_tiles):
        tiles = [jnp.asarray(arr.padded_tile(i, ghost)) for arr in ooc_arrays]
        result = jfn(*tiles)
        sl = [slice(None)] * result.ndim
        sl[ax] = slice(ghost, result.shape[ax] - ghost)
        interior = np.asarray(result[tuple(sl)])
        osl = [slice(None)] * out_host.ndim
        osl[ax] = slice(i * lead.tile_extent, (i + 1) * lead.tile_extent)
        out_host[tuple(osl)] = interior
    lead.data = out_host
    return lead


class OOCNSESolver:
    """Out-of-core LBM driver: runs an IncompressibleNavierStokesStepper
    over an OOC-tiled domain, ``ghost`` steps per sweep.

    The per-tile step is the stepper's jnp step on the padded slab; with
    ghost width g, g steps run on-device per round trip and the interior
    remains globally exact (each pull consumes one ghost layer).
    """

    def __init__(self, stepper, num_tiles, steps_per_sweep=1):
        self.stepper = stepper
        self.num_tiles = int(num_tiles)
        self.steps_per_sweep = int(steps_per_sweep)

    def prepare(self):
        f_0, f_1, bc_mask, missing_mask = self.stepper.prepare_fields()
        self.f = OOCArray.from_array(np.asarray(f_0), num_tiles=self.num_tiles)
        self.bc_mask = OOCArray.from_array(np.asarray(bc_mask), num_tiles=self.num_tiles)
        self.missing_mask = OOCArray.from_array(np.asarray(missing_mask), num_tiles=self.num_tiles)
        return self

    def run(self, num_steps, omega):
        g = self.steps_per_sweep
        if num_steps % g:
            raise ValueError(f"num_steps {num_steps} must be a multiple of steps_per_sweep {g}")

        stepper = self.stepper

        def tile_fn(f, bc, miss):
            def body(t, carry):
                a, b = carry
                a, b = stepper(a, b, bc, miss, omega, t)
                return (b, a)

            a, _ = jax.lax.fori_loop(0, g, body, (f, f))
            return a

        for _ in range(num_steps // g):
            ooc_map(tile_fn, [self.f, self.bc_mask, self.missing_mask], ghost=g)
        return self.f.to_numpy()
