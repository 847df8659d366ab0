"""Grid and sharding tests (strategy per reference tests/grids/test_grid_jax.py:21-55),
run on 8 virtual CPU devices."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tests.conftest import init_env
from xlb_tpu.velocity_set import D2Q9, D3Q19
from xlb_tpu.grid import grid_factory
from xlb_tpu.precision_policy import Precision

pytestmark = pytest.mark.fast  # whole-module smoke tier (sub-5-min suite)


def test_device_count_emulated():
    assert jax.device_count() == 8


def test_grid_create_field_2d():
    vs = init_env(D2Q9)
    grid = grid_factory((64, 32))
    f = grid.create_field(cardinality=9)
    assert f.shape == (9, 64, 32)
    assert f.dtype == np.float32
    spec = f.sharding.spec
    assert spec == P(None, "x", "y")
    assert len(f.addressable_shards) == 8
    assert f.addressable_shards[0].data.shape == (9, 8, 32)


def test_grid_create_field_3d_fill():
    vs = init_env(D3Q19)
    grid = grid_factory((16, 8, 8))
    f = grid.create_field(cardinality=1, dtype=Precision.FP32, fill_value=2.5)
    assert f.shape == (1, 16, 8, 8)
    np.testing.assert_allclose(np.asarray(f), 2.5)


def test_grid_2d_mesh_decomposition():
    vs = init_env(D2Q9)
    grid = grid_factory((32, 32), mesh_shape=(4, 2))
    f = grid.create_field(cardinality=9)
    assert f.addressable_shards[0].data.shape == (9, 8, 16)


def test_grid_rejects_indivisible_shape():
    vs = init_env(D2Q9)
    with pytest.raises(ValueError):
        grid_factory((30, 32))  # 30 not divisible by 8 devices on x


def test_bounding_box_indices():
    vs = init_env(D2Q9)
    grid = grid_factory((8, 16))
    box = grid.bounding_box_indices()
    assert set(box) == {"bottom", "top", "left", "right"}
    assert np.asarray(box["left"]).shape == (2, 16)
    assert all(x == 0 for x in box["left"][0])
    box2 = grid.bounding_box_indices(remove_edges=True)
    assert np.asarray(box2["left"]).shape == (2, 14)

    vs3 = D3Q19()
    grid3 = grid_factory((8, 8, 8))
    box3 = grid3.bounding_box_indices()
    assert set(box3) == {"bottom", "top", "left", "right", "front", "back"}
    assert np.asarray(box3["top"]).shape == (3, 64)
