"""Spatial-BC aux channels on the FAST kernel paths (round-3 VERDICT #1/#8).

The aux side array (per-voxel prescribed velocities, hybrid wall-distance
weights) previously worked only in the single-step kernels; these tests pin
its plumbing through the temporally-blocked k-step kernels (3D + 2D), the
padded-halo distributed window, and the extern-force (thermal-coupling)
kernel, against the jnp tier / single-step oracles.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import init_env
from xlb_tpu.velocity_set import D2Q9, D3Q19
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.boundary import (
    DoNothingBC,
    EquilibriumBC,
    FullwayBounceBackBC,
    HalfwayBounceBackBC,
    RegularizedBC,
    ZouHeBC,
)
from xlb_tpu.kernels.fused_step import (
    bc_to_spec,
    build_aux_field,
    build_fused_forced_step,
    build_fused_window,
    pack_masks,
)


def _profile_scene_3d(n=16, nz=128):
    """Channel with a parabolic (per-voxel) Regularized velocity inlet --
    the reference's flagship spatial-BC configuration
    (flow_past_sphere_3d.py:95-107)."""
    vs = init_env(D3Q19)
    grid = grid_factory((n, n, nz), mesh_shape=(1, 1, 1), devices=jax.devices()[:1])
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)
    walls = np.unique(
        np.concatenate([np.asarray(box[k]) for k in ("bottom", "top", "front", "back")], axis=1), axis=1
    )
    yz = (np.arange(n) + 0.5) / n - 0.5
    ry = 2 * yz
    rz = 2 * ((np.arange(nz) + 0.5) / nz - 0.5)
    gy, gz = np.meshgrid(ry, rz, indexing="ij")
    parab = 0.04 * np.maximum(0.0, 1.0 - gy**2 - gz**2)
    prescribed = np.zeros((3, 1, n, nz))
    prescribed[0, 0] = parab
    inlet = RegularizedBC("velocity", profile=lambda: prescribed, indices=box_ne["left"])
    bcs = [FullwayBounceBackBC(indices=walls.tolist()), inlet, DoNothingBC(indices=box_ne["right"])]
    stepper = IncompressibleNavierStokesStepper(grid, boundary_conditions=bcs)
    return stepper, stepper.prepare_fields()


@pytest.mark.parametrize("steps", [2, 3])
def test_kstep_aux_matches_single_steps_3d(steps):
    """The 3D k-step kernel carries the aux field on its extended sweeps:
    k blocked steps with a spatial profile inlet equal k single-step
    passes bitwise (f32 storage)."""
    from xlb_tpu.kernels.collide_stream_dma import build_fused_collide_stream_3d_dma
    from xlb_tpu.kernels.collide_stream_2step import build_fused_collide_stream_3d_kstep

    stepper, (f0, f1, bm, mm) = _profile_scene_3d()
    vs = stepper.velocity_set
    specs = [bc_to_spec(bc, vs) for bc in stepper.boundary_conditions]
    aux = jnp.asarray(build_aux_field(stepper))
    assert aux is not None and aux.shape[0] == 3
    kw = dict(
        collision="BGK", bc_specs=specs, compute_dtype=jnp.float32,
        store_dtype=jnp.float32, tile=(8, 8), interpret=True, shifted=False,
    )
    one = build_fused_collide_stream_3d_dma(vs, stepper.grid.shape, **kw)
    kfn = build_fused_collide_stream_3d_kstep(vs, stepper.grid.shape, steps=steps, **kw)
    mask_i32 = pack_masks(bm, mm)
    g_ref = f0
    for _ in range(steps):
        g_ref = one(g_ref, mask_i32, 1.5, aux=aux)
    g_k = kfn(f0, mask_i32, 1.5, aux=aux)
    a, b = np.asarray(g_ref), np.asarray(g_k)
    np.testing.assert_allclose(b, a, rtol=2e-6, atol=1e-7)
    assert np.mean(a == b) > 0.9


def test_window_uses_kstep_with_aux():
    """build_fused_window no longer drops temporal blocking when an aux
    field is present: a spatial-profile window matches the jnp tier."""
    stepper, (f0, f1, bm, mm) = _profile_scene_3d()
    steps = 5  # odd: also exercises the single-step remainder with aux
    run = build_fused_window(stepper, steps, tile=(8, 8), interpret=True, temporal_steps=2)
    ga, _ = run(f0, f1, bm, mm, 1.5)
    fa, fb = f0, f1
    for t in range(steps):
        fa, fb = stepper(fa, fb, bm, mm, 1.5, t)
        fa, fb = fb, fa
    diff = float(jnp.abs(fa - ga).max())
    assert diff < 5e-6, f"windowed k-step with aux diverges from jnp tier by {diff}"


def test_2d_kstep_aux_matches_single_steps():
    """The 2D k-step kernel carries aux channels via the 8-row halo blocks."""
    from xlb_tpu.kernels.collide_stream_2d import (
        build_fused_collide_stream_2d,
        build_fused_collide_stream_2d_kstep,
    )

    vs = init_env(D2Q9)
    n, ny = 32, 128
    grid = grid_factory((n, ny), mesh_shape=(1, 1), devices=jax.devices()[:1])
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)
    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in ("bottom", "top")], axis=1), axis=1)
    y = (np.arange(ny) + 0.5) / ny
    prescribed = np.zeros((2, 1, ny))
    prescribed[0, 0] = 0.05 * 4 * y * (1 - y)
    inlet = ZouHeBC("velocity", profile=lambda: prescribed, indices=box_ne["left"])
    bcs = [FullwayBounceBackBC(indices=walls.tolist()), inlet, DoNothingBC(indices=box_ne["right"])]
    stepper = IncompressibleNavierStokesStepper(grid, boundary_conditions=bcs)
    f0, f1, bm, mm = stepper.prepare_fields()
    specs = [bc_to_spec(bc, vs) for bc in stepper.boundary_conditions]
    aux = jnp.asarray(build_aux_field(stepper))
    kw = dict(
        collision="BGK", bc_specs=specs, compute_dtype=jnp.float32,
        store_dtype=jnp.float32, tile_x=8, interpret=True, shifted=False,
    )
    one = build_fused_collide_stream_2d(vs, grid.shape, **kw)
    kfn = build_fused_collide_stream_2d_kstep(vs, grid.shape, steps=3, **kw)
    mask_i32 = pack_masks(bm, mm)
    g_ref = f0
    for _ in range(3):
        g_ref = one(g_ref, mask_i32, 1.6, aux=aux)
    g_k = kfn(f0, mask_i32, 1.6, aux=aux)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref), rtol=2e-6, atol=1e-7)


def test_forced_step_composes_with_spatial_bc():
    """extern_force (per-voxel exact-difference force) + a spatial profile
    inlet run together in one fused pass: force rides channels [0:d], BC
    channels follow at offset d (VERDICT round-2 missing #1 tail)."""
    stepper, (f0, f1, bm, mm) = _profile_scene_3d(n=16, nz=128)
    shape = stepper.grid.shape
    rng = np.random.default_rng(5)
    force = jnp.asarray(1e-4 * rng.standard_normal((3,) + shape).astype(np.float32))
    fused = build_fused_forced_step(stepper, tile=(8, 8), interpret=True)

    fa, fb = f0, f1
    ga, gb = f0, f1
    for t in range(3):
        fa, fb = stepper._step_pull(fa, fb, bm, mm, 1.5, t, force_field=force)
        fa, fb = fb, fa
        ga, gb = fused(ga, gb, bm, mm, 1.5, force, t)
        ga, gb = gb, ga
    diff = float(jnp.abs(fa - ga).max())
    assert diff < 5e-6, f"forced+spatial-BC fused step diverges from jnp tier by {diff}"


def test_spatial_pressure_outlet_fused_matches_jnp():
    """Per-voxel prescribed DENSITY (spatial ZouHe/Regularized pressure)
    rides the new aux rho channel (round-3 VERDICT weak #1): fused step ==
    jnp tier on a channel with a pressure gradient across the outlet."""
    from xlb_tpu.kernels.fused_step import build_fused_step

    vs = init_env(D3Q19)
    n, nz = 16, 16
    grid = grid_factory((n, n, nz), mesh_shape=(1, 1, 1), devices=jax.devices()[:1])
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)
    walls = np.unique(
        np.concatenate([np.asarray(box[k]) for k in ("bottom", "top", "front", "back")], axis=1), axis=1
    )
    # outlet density varies linearly across y: a spatial pressure profile
    rho_out = np.ones((1, 1, n, nz))
    rho_out[0, 0] += 0.002 * (np.arange(n)[:, None] / n - 0.5)
    bcs = [
        FullwayBounceBackBC(indices=walls.tolist()),
        ZouHeBC("velocity", prescribed_value=(0.03, 0.0, 0.0), indices=box_ne["left"]),
        RegularizedBC("pressure", profile=lambda: rho_out, indices=box_ne["right"]),
    ]
    stepper = IncompressibleNavierStokesStepper(grid, boundary_conditions=bcs)
    f0, f1, bm, mm = stepper.prepare_fields()
    spec = bc_to_spec(bcs[-1], vs)
    assert spec["value"] == "aux_rho"
    aux = build_aux_field(stepper)
    assert aux is not None and aux.shape[0] == 1  # rho channel only

    fused = build_fused_step(stepper, tile=(8, 8), interpret=True, kernel="blocked")
    fa, fb = f0, f1
    ga, gb = f0, f1
    for t in range(4):
        fa, fb = stepper(fa, fb, bm, mm, 1.4, t)
        fa, fb = fb, fa
        ga, gb = fused(ga, gb, bm, mm, 1.4, t)
        ga, gb = gb, ga
    diff = float(jnp.abs(fa - ga).max())
    assert diff < 5e-6, f"spatial-pressure fused step diverges from jnp tier by {diff}"


def test_ade_fused_spatial_dirichlet_and_odd_z():
    """Fused ADE now composes with spatial-BC aux channels AND pads
    non-128-multiple z internally (round-3 VERDICT weak #1): PALLAS ADE
    stepper == JAX ADE stepper with a spatial Dirichlet scalar wall."""
    from xlb_tpu.compute_backend import ComputeBackend
    from xlb_tpu.models.ade import AdvectionDiffusionStepper
    from xlb_tpu.boundary.registry import boundary_condition_registry

    def _scene(backend):
        boundary_condition_registry.reset()
        init_env(D3Q19, backend=backend)
        n, nz = 16, 48  # nz=48: NOT a 128 multiple
        grid = grid_factory((n, n, nz), mesh_shape=(1, 1, 1), devices=jax.devices()[:1])
        box = grid.bounding_box_indices()
        box_ne = grid.bounding_box_indices(remove_edges=True)
        walls = np.unique(
            np.concatenate([np.asarray(box[k]) for k in ("bottom", "top", "front", "back")], axis=1), axis=1
        )
        # spatial Dirichlet scalar at the inlet: phi varies across y
        phi_wall = np.ones((1, 1, n, nz))
        phi_wall[0, 0] += 0.3 * np.sin(2 * np.pi * np.arange(n) / n)[:, None]
        bcs = [
            FullwayBounceBackBC(indices=walls.tolist()),
            RegularizedBC("pressure", profile=lambda: phi_wall, indices=box_ne["left"]),
            DoNothingBC(indices=box_ne["right"]),
        ]
        stepper = AdvectionDiffusionStepper(grid, boundary_conditions=bcs)
        rng = np.random.default_rng(3)
        phi0 = 1.0 + 0.05 * rng.standard_normal((n, n, nz)).astype(np.float32)
        g0, g1, bm, mm = stepper.prepare_fields(phi_init=phi0)
        u = jnp.asarray(0.02 * rng.standard_normal((3, n, n, nz)).astype(np.float32))
        return stepper, (g0, g1, bm, mm), u

    stepper_j, (g0, g1, bm, mm), u = _scene(ComputeBackend.JAX)
    fa, fb = g0, g1
    for t in range(3):
        fa, fb = stepper_j(fa, fb, bm, mm, 1.3, u, t)
        fa, fb = fb, fa
    expected = np.asarray(fa)

    stepper_p, (h0, h1, bm2, mm2), u2 = _scene(ComputeBackend.PALLAS)
    assert stepper_p._pallas_step is not None
    ga, gb = h0, h1
    for t in range(3):
        ga, gb = stepper_p(ga, gb, bm2, mm2, 1.3, u2, t)
        ga, gb = gb, ga
    np.testing.assert_allclose(np.asarray(ga), expected, rtol=2e-5, atol=1e-6)


def test_distributed_window_profile_inlet_and_moving_wall():
    """(2,4) mesh distributed fused window with the full spatial-BC aux
    surface (profile inlet + spatial moving wall) matches the single-device
    jnp tier -- the reference's flagship distributed use case
    (nse_stepper.py:478-663 runs the full BC zoo multi-device)."""
    from xlb_tpu.parallel.pallas_distribute import build_distributed_fused_window

    def _scene(mesh_shape, devices=None):
        from xlb_tpu.boundary.registry import boundary_condition_registry

        boundary_condition_registry.reset()
        init_env(D3Q19)
        n, nz = 32, 16
        grid = grid_factory((n, n, nz), mesh_shape=mesh_shape, devices=devices)
        box = grid.bounding_box_indices()
        box_ne = grid.bounding_box_indices(remove_edges=True)
        walls = np.unique(
            np.concatenate([np.asarray(box[k]) for k in ("bottom", "top", "front", "back")], axis=1), axis=1
        )
        yz = 2 * ((np.arange(n) + 0.5) / n - 0.5)
        rz = 2 * ((np.arange(nz) + 0.5) / nz - 0.5)
        gy, gz = np.meshgrid(yz, rz, indexing="ij")
        prescribed = np.zeros((3, 1, n, nz))
        prescribed[0, 0] = 0.04 * np.maximum(0.0, 1.0 - gy**2 - gz**2)
        center = np.array([n / 2, n / 2, nz / 2])

        def rotation_profile(coords):
            r = coords - center[:, None]
            return np.cross(np.array([0.0, 0.0, 0.015])[None, :], r.T).T

        # a small rotating block in the interior: spatial moving-wall aux
        ii, jj, kk = np.meshgrid(np.arange(14, 18), np.arange(14, 18), np.arange(6, 10), indexing="ij")
        block = np.stack([ii.ravel(), jj.ravel(), kk.ravel()])
        bcs = [
            FullwayBounceBackBC(indices=walls.tolist()),
            RegularizedBC("velocity", profile=lambda: prescribed, indices=box_ne["left"]),
            DoNothingBC(indices=box_ne["right"]),
            HalfwayBounceBackBC(indices=block.tolist(), profile=rotation_profile),
        ]
        stepper = IncompressibleNavierStokesStepper(grid, boundary_conditions=bcs)
        return stepper, stepper.prepare_fields()

    steps = 4
    st1, (f0, f1, bm, mm) = _scene((1, 1, 1), devices=jax.devices()[:1])
    fa, fb = f0, f1
    for t in range(steps):
        fa, fb = st1(fa, fb, bm, mm, 1.5, t)
        fa, fb = fb, fa
    expected = np.asarray(fa)

    stn, (g0, g1, bmn, mmn) = _scene((2, 4, 1))
    run = build_distributed_fused_window(stn, steps, tile=(4, 8), interpret=True, temporal_steps=2)
    ga, _ = run(g0, g1, bmn, mmn, 1.5)
    np.testing.assert_allclose(np.asarray(ga), expected, rtol=1e-5, atol=1e-6)


def test_distributed_window_hybrid_mesh_and_profile_inlet():
    """VERDICT r2 #1 done-criterion (a): the distributed fused window
    builds and parity-passes on a (2,4) mesh with a RegularizedBC velocity
    PROFILE inlet and a HybridBC mesh object (per-link wall distances in
    the aux weight channels), vs the single-device jnp tier."""
    from xlb_tpu.boundary import HybridBC
    from xlb_tpu.geometry import sphere_triangles
    from xlb_tpu.parallel.pallas_distribute import build_distributed_fused_window

    def _scene(mesh_shape, devices=None):
        from xlb_tpu.boundary.registry import boundary_condition_registry

        boundary_condition_registry.reset()
        init_env(D3Q19)
        n, nz = 32, 16
        grid = grid_factory((n, n, nz), mesh_shape=mesh_shape, devices=devices)
        box = grid.bounding_box_indices()
        box_ne = grid.bounding_box_indices(remove_edges=True)
        walls = np.unique(
            np.concatenate([np.asarray(box[k]) for k in ("bottom", "top", "front", "back")], axis=1), axis=1
        )
        yz = 2 * ((np.arange(n) + 0.5) / n - 0.5)
        rz = 2 * ((np.arange(nz) + 0.5) / nz - 0.5)
        gy, gz = np.meshgrid(yz, rz, indexing="ij")
        prescribed = np.zeros((3, 1, n, nz))
        prescribed[0, 0] = 0.04 * np.maximum(0.0, 1.0 - gy**2 - gz**2)
        tris = sphere_triangles(center=(n / 2, n / 2, nz / 2), radius=3.2, subdivisions=2)
        bcs = [
            FullwayBounceBackBC(indices=walls.tolist()),
            RegularizedBC("velocity", profile=lambda: prescribed, indices=box_ne["left"]),
            DoNothingBC(indices=box_ne["right"]),
            HybridBC(bc_method="bounceback_regularized", mesh_vertices=tris, use_mesh_distance=True),
        ]
        stepper = IncompressibleNavierStokesStepper(grid, boundary_conditions=bcs)
        return stepper, stepper.prepare_fields()

    steps = 4
    st1, (f0, f1, bm, mm) = _scene((1, 1, 1), devices=jax.devices()[:1])
    hybrid = st1.boundary_conditions[-1]
    assert hybrid._distances is not None and np.isfinite(hybrid._distances).any()
    fa, fb = f0, f1
    for t in range(steps):
        fa, fb = st1(fa, fb, bm, mm, 1.5, t)
        fa, fb = fb, fa
    expected = np.asarray(fa)

    stn, (g0, g1, bmn, mmn) = _scene((2, 4, 1))
    run = build_distributed_fused_window(stn, steps, tile=(4, 8), interpret=True, temporal_steps=2)
    ga, _ = run(g0, g1, bmn, mmn, 1.5)
    np.testing.assert_allclose(np.asarray(ga), expected, rtol=1e-5, atol=1e-6)
