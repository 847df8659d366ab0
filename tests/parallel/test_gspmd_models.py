"""GSPMD distribution of the non-NSE model families (multires, IBM).

The reference runs multires only on the Neon multi-GPU backend
(nse_multires_stepper.py + neon halo machinery) and IBM on a single GPU.
Here both steppers are pure jnp programs, so multi-chip runs are the
same code jitted over sharded inputs -- XLA inserts the collectives for
explode/coalesce gathers and the IBM scatter-adds.  These tests pin that
capability: sharded results must match the single-device run.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tests.conftest import init_env
from xlb_tpu.velocity_set import D2Q9, D3Q19
from xlb_tpu.grid import grid_factory
from xlb_tpu.grid.multires import MultiresGrid
from xlb_tpu.models.multires import MultiresIncompressibleNavierStokesStepper
from xlb_tpu.models.ibm import IBMStepper
from xlb_tpu.boundary.registry import boundary_condition_registry


def _mesh():
    return Mesh(np.array(jax.devices()).reshape(8), ("x",))


def _shard(mesh, a, spec):
    return jax.device_put(a, NamedSharding(mesh, spec))


def test_gspmd_sharded_multires_matches_single_device():
    vs = init_env(D2Q9)
    grid = MultiresGrid((32, 32), boxes=[((8, 8), (16, 16))])
    stepper = MultiresIncompressibleNavierStokesStepper(grid)
    fs, _, bms, mms = stepper.prepare_fields()

    # deterministic non-uniform initial state: modulate every population
    fs = [
        f * (1.0 + 0.01 * jnp.sin(jnp.arange(f.shape[1], dtype=jnp.float32) * 0.37).reshape(1, -1, 1))
        for f in fs
    ]

    step = jax.jit(lambda fs: stepper(fs, bms, mms, 1.4))
    ref = fs
    for _ in range(2):
        ref = step(ref)
    ref = [np.asarray(f) for f in ref]

    mesh = _mesh()
    fs_s = [_shard(mesh, f, P(None, "x")) for f in fs]
    bms_s = [_shard(mesh, b, P(None, "x")) for b in bms]
    mms_s = [_shard(mesh, m, P(None, "x")) for m in mms]
    step_s = jax.jit(lambda fs: stepper(fs, bms_s, mms_s, 1.4))
    out = fs_s
    for _ in range(2):
        out = step_s(out)
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o), r, rtol=1e-5, atol=1e-7)


def test_gspmd_sharded_ibm_matches_single_device():
    vs = init_env(D3Q19)
    from xlb_tpu.geometry import sphere_triangles
    from xlb_tpu.helper.ibm_helper import prepare_immersed_boundary

    n = 16
    grid = grid_factory((n, n, n), mesh_shape=(1, 1, 1), devices=jax.devices()[:1])
    stepper = IBMStepper(grid, boundary_conditions=())
    f0, f1, bm, mm = stepper.prepare_fields()
    tris = sphere_triangles(center=(n / 2,) * 3, radius=3.0, subdivisions=1)
    verts, areas, vel = prepare_immersed_boundary(tris)
    vel = jnp.asarray(vel)

    step = jax.jit(
        lambda f0, f1, bm, mm: stepper(f0, f1, jnp.asarray(verts), jnp.asarray(areas), vel, bm, mm, 1.5, 0)
    )
    ra, rb, _ = step(f0, f1, bm, mm)
    ra2, rb2, _ = step(ra, rb, bm, mm)
    ref = np.asarray(rb2)

    boundary_condition_registry.reset()
    mesh = _mesh()
    grid2 = grid_factory((n, n, n), mesh_shape=(1, 1, 1), devices=jax.devices()[:1])
    stepper2 = IBMStepper(grid2, boundary_conditions=())
    f0b, f1b, bmb, mmb = stepper2.prepare_fields()
    f0s = _shard(mesh, f0b, P(None, "x"))
    f1s = _shard(mesh, f1b, P(None, "x"))
    bms = _shard(mesh, bmb, P(None, "x"))
    mms = _shard(mesh, mmb, P(None, "x"))
    step_s = jax.jit(
        lambda f0, f1, bm, mm: stepper2(f0, f1, jnp.asarray(verts), jnp.asarray(areas), vel, bm, mm, 1.5, 0)
    )
    sa, sb, _ = step_s(f0s, f1s, bms, mms)
    sa2, sb2, _ = step_s(sa, sb, bms, mms)
    np.testing.assert_allclose(np.asarray(sb2), ref, rtol=1e-5, atol=1e-7)


def test_gspmd_sharded_ade_matches_single_device():
    """The advection-diffusion stepper distributes under GSPMD like the
    other jnp-tier models (scalar transport on sharded fields)."""
    from xlb_tpu.models.ade import AdvectionDiffusionStepper

    vs = init_env(D2Q9)
    n = 32
    grid = grid_factory((n, n), mesh_shape=(1, 1), devices=jax.devices()[:1])
    stepper = AdvectionDiffusionStepper(grid)
    x = np.arange(n) - n / 2
    xx, yy = np.meshgrid(x, x, indexing="ij")
    phi0 = np.exp(-(xx**2 + yy**2) / 32).astype(np.float32)
    g0, g1, bm, mm = stepper.prepare_fields(phi_init=phi0)
    u = jnp.zeros((2, n, n), jnp.float32).at[0].set(0.04)

    step = jax.jit(lambda g0, g1: stepper(g0, g1, bm, mm, 1.3, u, 0))
    ra, rb = step(g0, g1)
    ra2, rb2 = step(rb, ra)
    ref = np.asarray(rb2)

    mesh = _mesh()
    g0s = _shard(mesh, g0, P(None, "x"))
    g1s = _shard(mesh, g1, P(None, "x"))
    bms = _shard(mesh, bm, P(None, "x"))
    mms = _shard(mesh, mm, P(None, "x"))
    us = _shard(mesh, u, P(None, "x"))
    step_s = jax.jit(lambda g0, g1: stepper(g0, g1, bms, mms, 1.3, us, 0))
    sa, sb = step_s(g0s, g1s)
    sa2, sb2 = step_s(sb, sa)
    np.testing.assert_allclose(np.asarray(sb2), ref, rtol=1e-6, atol=1e-8)
