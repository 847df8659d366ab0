"""Utils tests: VTK writer structure, unit conversion round trips, USD files,
profiling helpers."""

import os

import numpy as np
import pytest

from xlb_tpu.utils import (
    write_vti,
    save_image,
    UnitConvertor,
    omega_from_reynolds,
    viscosity_from_omega,
    save_usd_mesh,
    save_usd_points,
    mlups,
)

pytestmark = pytest.mark.fast  # whole-module smoke tier (sub-5-min suite)


def test_write_vti_structure(tmp_path):
    rho = np.random.default_rng(0).random((1, 8, 6, 4)).astype(np.float32)
    u = np.random.default_rng(1).random((3, 8, 6, 4)).astype(np.float32)
    path = write_vti(str(tmp_path / "f.vti"), {"rho": rho, "u": u})
    raw = open(path, "rb").read()
    assert raw.startswith(b"<?xml")
    assert b'WholeExtent="0 7 0 5 0 3"' in raw
    assert b'Name="rho" NumberOfComponents="1"' in raw
    assert b'Name="u" NumberOfComponents="3"' in raw
    # appended data: 8-byte size headers + payloads
    payload = rho.size * 4 + u.size * 4 + 16
    assert len(raw) > payload


def test_write_vti_rejects_mismatched_shapes(tmp_path):
    with pytest.raises(ValueError):
        write_vti(str(tmp_path / "bad.vti"), {"a": np.zeros((1, 4, 4, 4)), "b": np.zeros((1, 8, 8, 8))})


def test_save_image(tmp_path):
    u = np.random.default_rng(0).random((2, 32, 24)).astype(np.float32)
    path = save_image(u, timestep=7, prefix=str(tmp_path / "img"))
    assert os.path.exists(path) and os.path.getsize(path) > 100


def test_unit_convertor_roundtrips():
    conv = UnitConvertor(velocity_lbm_unit=0.05, velocity_physical_unit=10.0, voxel_size_physical_unit=0.01)
    assert np.isclose(conv.velocity_to_physical(0.05), 10.0)
    assert np.isclose(conv.velocity_to_lbm(conv.velocity_to_physical(0.031)), 0.031)
    assert np.isclose(conv.length_to_lbm(conv.length_to_physical(12.5)), 12.5)
    assert np.isclose(conv.time_to_lbm(conv.time_to_physical(7.0)), 7.0)
    assert np.isclose(conv.viscosity_to_physical(conv.viscosity_to_lbm(1.5e-5)), 1.5e-5)
    # pressure: lattice reference pressure rho*cs2 = 1/3 maps to the physical reference
    assert np.isclose(conv.pressure_to_physical(1.0 / 3.0), conv.reference_pressure)


def test_omega_viscosity_inverses():
    om = omega_from_reynolds(100.0, 0.05, 64)
    nu = viscosity_from_omega(om)
    assert np.isclose(0.05 * 64 / nu, 100.0)


def test_usd_exports(tmp_path):
    from xlb_tpu.geometry import sphere_triangles

    tris = sphere_triangles(radius=1.0, subdivisions=0)
    p = save_usd_mesh(str(tmp_path / "m.usda"), tris)
    txt = open(p).read()
    assert txt.startswith("#usda 1.0") and "faceVertexCounts" in txt
    p2 = save_usd_points(str(tmp_path / "p.usda"), np.random.default_rng(0).random((10, 3)), values=np.arange(10.0))
    assert "displayColor" in open(p2).read()


def test_mlups_definition():
    # MLUPS = cells * steps / seconds / 1e6 (reference mlups_3d.py:265-268)
    assert mlups(256**3, 100, 10.0) == 256**3 * 100 / 10.0 / 1e6


def test_downsample_field_shapes_and_mean():
    import jax.numpy as jnp
    from xlb_tpu.utils import downsample_field

    f = jnp.ones((3, 16, 8)) * 2.5
    g = downsample_field(f, 2)
    assert g.shape == (3, 8, 4)
    np.testing.assert_allclose(np.asarray(g), 2.5, rtol=1e-6)
    assert downsample_field(f, 1) is f


def test_rotate_geometry_quarter_turn():
    from xlb_tpu.utils import rotate_geometry, axangle2mat

    idx = np.array([[7], [5], [5]])  # +x of origin (5,5,5)
    r = np.asarray(rotate_geometry(idx, origin=(5, 5, 5), axis=(0, 0, 1), angle=np.pi / 2))
    # quarter turn about z maps (+2, 0) -> (0, +2) up to the matrix's sign convention
    assert r[2, 0] == 5
    assert sorted([r[0, 0], r[1, 0]]) in ([3, 5], [5, 7])
    m = axangle2mat((0, 1, 0), 0.3)
    np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-12)


def test_colorize_scalars_range_and_fallback():
    from xlb_tpu.utils import colorize_scalars

    rgb = colorize_scalars(np.array([0.0, 0.5, 1.0, np.nan]), value_range=(0.0, 1.0))
    assert rgb.shape == (4, 3)
    assert (rgb >= 0.0).all() and (rgb <= 1.0).all()


def test_voxelize_stl_roundtrip(tmp_path):
    from xlb_tpu.geometry import sphere_triangles, save_stl, voxelize_stl, solid_voxel_indices

    p = tmp_path / "sphere.stl"
    save_stl(str(p), sphere_triangles(center=(0, 0, 0), radius=4.0, subdivisions=2))
    mask, pitch, origin = voxelize_stl(str(p), length_lbm_unit=16)
    assert mask.any() and 0.2 < mask.mean() < 0.55
    idx = solid_voxel_indices(mask)
    assert idx.shape[0] == 3 and idx.shape[1] == mask.sum()
