"""Field I/O: PNG slice images and VTK ImageData export.

Parity surface with reference xlb/utils/utils.py:58-217 (save_image,
save_fields_vtk, save_BCs_vtk).  The VTK writer here is dependency-free: it
emits VTK XML ImageData (.vti) with appended raw binary encoding, readable
by ParaView/VisIt/pyvista -- no pyvista requirement.
"""

import base64
import os
import struct

import numpy as np


def _to_numpy(field):
    arr = np.asarray(field)
    return arr


def save_image(fld, timestep=None, prefix=None, filename=None, **kwargs):
    """Save a 2D scalar field (or a 2D slice) as a PNG image.

    Matches reference utils.py:58-99: 3D vector fields are reduced to
    magnitude, the array is transposed/flipped into image orientation.
    """
    fld = _to_numpy(fld)
    if filename is None:
        name = prefix or "field"
        filename = f"{name}_{timestep:07d}.png" if timestep is not None else f"{name}.png"

    if fld.ndim == 3:
        if fld.shape[0] in (1, 2, 3):  # (c, nx, ny) vector/scalar field
            fld = np.sqrt((fld.astype(np.float64) ** 2).sum(axis=0)) if fld.shape[0] > 1 else fld[0]
        else:
            raise ValueError(f"expected a 2D field or (c, nx, ny) array, got shape {fld.shape}")
    if fld.ndim != 2:
        raise ValueError(f"expected a 2D field, got shape {fld.shape}")

    img = np.flipud(fld.T)
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    plt.imsave(filename, img, cmap=kwargs.get("cmap", "viridis"),
               vmin=kwargs.get("vmin"), vmax=kwargs.get("vmax"))
    return filename


# ---------------------------------------------------------------------------
# VTK XML ImageData writer (pure Python)
# ---------------------------------------------------------------------------

_VTK_DTYPES = {
    np.dtype(np.float32): "Float32",
    np.dtype(np.float64): "Float64",
    np.dtype(np.int32): "Int32",
    np.dtype(np.uint8): "UInt8",
    np.dtype(np.int8): "Int8",
    np.dtype(np.uint32): "UInt32",
    np.dtype(np.bool_): "UInt8",
}


def write_vti(filename, fields, spacing=(1.0, 1.0, 1.0), origin=(0.0, 0.0, 0.0)):
    """Write point-data ``fields`` (dict name -> (nx[,ny[,nz]]) or
    (c, nx, ny, nz) arrays) to a VTK XML ImageData file.

    All fields must share the same spatial shape.  2D fields get a singleton
    z-dimension.  Multi-component fields are written as interleaved vectors.
    """
    prepared = {}
    shape = None
    for name, arr in fields.items():
        arr = _to_numpy(arr)
        if arr.dtype == np.bool_:
            arr = arr.astype(np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        if arr.ndim == 3:
            arr = arr[None, ...]
        if arr.ndim != 4:
            raise ValueError(f"field {name!r} has unsupported shape {arr.shape}")
        if arr.shape[1:] != (shape or arr.shape[1:]):
            raise ValueError("all fields must share a spatial shape")
        shape = arr.shape[1:]
        prepared[name] = arr
    nx, ny, nz = shape

    # appended raw binary: offsets computed as we serialize
    blobs = []
    offset = 0
    array_tags = []
    for name, arr in prepared.items():
        ncomp = arr.shape[0]
        vtk_type = _VTK_DTYPES[arr.dtype]
        # VTK wants x fastest: transpose (c, x, y, z) -> (z, y, x, c)
        data = np.ascontiguousarray(arr.transpose(3, 2, 1, 0))
        raw = data.tobytes()
        blobs.append(struct.pack("<Q", len(raw)) + raw)
        array_tags.append(
            f'<DataArray type="{vtk_type}" Name="{name}" NumberOfComponents="{ncomp}" '
            f'format="appended" offset="{offset}"/>'
        )
        offset += 8 + len(raw)

    extent = f"0 {nx - 1} 0 {ny - 1} 0 {nz - 1}"
    header = f"""<?xml version="1.0"?>
<VTKFile type="ImageData" version="1.0" byte_order="LittleEndian" header_type="UInt64">
  <ImageData WholeExtent="{extent}" Origin="{origin[0]} {origin[1]} {origin[2]}" Spacing="{spacing[0]} {spacing[1]} {spacing[2]}">
    <Piece Extent="{extent}">
      <PointData>
        {chr(10).join(array_tags)}
      </PointData>
      <CellData/>
    </Piece>
  </ImageData>
  <AppendedData encoding="raw">
   _"""

    with open(filename, "wb") as f:
        f.write(header.encode())
        for blob in blobs:
            f.write(blob)
        f.write(b"\n  </AppendedData>\n</VTKFile>\n")
    return filename


def save_fields_vtk(fields, timestep=None, output_dir=".", prefix="fields", filename=None, spacing=(1.0, 1.0, 1.0)):
    """Save a dict of fields to a .vti file (reference utils.py:101-154)."""
    if filename is None:
        stamp = f"_{timestep:07d}" if timestep is not None else ""
        filename = os.path.join(output_dir, f"{prefix}{stamp}.vti")
    return write_vti(filename, fields, spacing=spacing)


def save_BCs_vtk(bc_mask, timestep=None, output_dir=".", filename=None):
    """Save the boundary-id mask for inspection (reference utils.py:156-217)."""
    if filename is None:
        stamp = f"_{timestep:07d}" if timestep is not None else ""
        filename = os.path.join(output_dir, f"BCs{stamp}.vti")
    return write_vti(filename, {"BCs": _to_numpy(bc_mask).astype(np.uint8)})
