"""HybridBC tests: distances, stability of all three methods on a mesh
sphere, and halfway-limit consistency."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import init_env
from xlb_tpu.velocity_set import D3Q19
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.boundary import HybridBC, EquilibriumBC, FullwayBounceBackBC, ExtrapolationOutflowBC
from xlb_tpu.geometry import sphere_triangles
from xlb_tpu.geometry.distances import directional_wall_distances, ray_triangle_hits
from xlb_tpu.ops import Macroscopic



@pytest.mark.fast
def test_ray_triangle_hits_analytic():
    # unit triangle in the z=2 plane; ray along +z from origin hits at t=2
    tri = np.array([[[0, -1, 2], [2, 1, 2], [-2, 1, 2]]], dtype=np.float64)
    t = ray_triangle_hits(np.array([[0.0, 0.0, 0.0], [10.0, 10.0, 0.0]]), np.array([0.0, 0.0, 1.0]), tri)
    assert np.isclose(t[0], 2.0)
    assert np.isinf(t[1])


@pytest.mark.fast
def test_directional_distances_sphere():
    vs = init_env(D3Q19)
    tris = sphere_triangles(center=(8, 8, 8), radius=3.0, subdivisions=3)
    # voxel just outside the sphere surface along +x: (12, 8, 8); the -x
    # direction link hits the wall at t = 1 - (4 - 3) = ... distance from
    # 12 to surface at 11 -> t = 1.0 along c = (-1, 0, 0)
    voxels = np.array([[12], [8], [8]])
    d = directional_wall_distances(tris, voxels, vs._c)
    l_minus_x = int(np.nonzero((vs._c[0] == -1) & (vs._c[1] == 0) & (vs._c[2] == 0))[0][0])
    assert abs(d[l_minus_x, 0] - 1.0) < 0.05
    l_plus_x = int(np.nonzero((vs._c[0] == 1) & (vs._c[1] == 0) & (vs._c[2] == 0))[0][0])
    assert np.isinf(d[l_plus_x, 0])


@pytest.mark.parametrize("method", ["bounceback", "bounceback_regularized", "bounceback_grads", pytest.param("nonequilibrium_regularized", marks=pytest.mark.fast)])
def test_hybrid_methods_stable_on_mesh_sphere(method):
    vs = init_env(D3Q19)
    nx, nyz = 32, 16
    grid = grid_factory((nx, nyz, nyz))
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)
    tris = sphere_triangles(center=(nx / 3, nyz / 2, nyz / 2), radius=3.2, subdivisions=2)

    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in ("bottom", "top", "front", "back")], axis=1), axis=1)
    bcs = [
        FullwayBounceBackBC(indices=walls.tolist()),
        EquilibriumBC(rho=1.0, u=(0.03, 0.0, 0.0), indices=box_ne["left"]),
        ExtrapolationOutflowBC(indices=box_ne["right"]),
        HybridBC(bc_method=method, mesh_vertices=tris),
    ]
    stepper = IncompressibleNavierStokesStepper(grid, boundary_conditions=bcs)
    f0, f1, bm, mm = stepper.prepare_fields()
    hybrid = bcs[-1]
    assert hybrid._distances is not None and np.isfinite(hybrid._distances).any()

    run = stepper.build_multi_step(50, donate=False)
    f0, f1 = run(f0, f1, bm, mm, 1.2)
    rho, u = Macroscopic()(f0)
    u = np.asarray(u)
    assert np.isfinite(u).all(), f"{method} blew up"
    assert np.abs(u).max() < 0.2
    # flow decelerates behind the sphere relative to the free stream
    assert u[0, 2, nyz // 2, nyz // 2] > 0.0
