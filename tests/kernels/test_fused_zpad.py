"""Internal z padding: the manual-DMA kernel on a padded 128-multiple lane
extent with logical-extent lane rolls (collide_stream._roll_lane) matches
the unpadded jnp tier bit-for-bit on the logical domain -- pad columns are
solid keep-out cells and never feed logical outputs, periodic z included.
On real TPU hardware build_fused_step/window engage this path automatically
for any z extent (fused_step.py z_pad); interpret mode keeps the blocked
fallback, so this test drives the padded kernel explicitly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import init_env
from xlb_tpu.velocity_set import D3Q19
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.boundary import EquilibriumBC, FullwayBounceBackBC, HalfwayBounceBackBC
from xlb_tpu.kernels.fused_step import pack_masks


def _scene(grid):
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)
    walls = np.unique(
        np.concatenate([np.asarray(box[k]) for k in ("bottom", "left", "right")], axis=1), axis=1
    )
    return [
        FullwayBounceBackBC(indices=walls.tolist()),
        HalfwayBounceBackBC(indices=box_ne["front"]),
        EquilibriumBC(rho=1.0, u=(0.02, 0.0, 0.0), indices=box_ne["top"]),
    ]


def _padded_setup(z_pad):
    vs = init_env(D3Q19)
    shape = (16, 16, 24)  # z stays PERIODIC (no BC on z faces) on purpose
    grid = grid_factory(shape, mesh_shape=(1, 1, 1), devices=jax.devices()[:1])
    st = IncompressibleNavierStokesStepper(grid, boundary_conditions=_scene(grid))
    f0, f1, bm, mm = st.prepare_fields()
    key = jax.random.PRNGKey(0)
    f0 = f0 + 0.01 * jax.random.uniform(key, f0.shape, f0.dtype)

    pad4 = ((0, 0),) * 3 + ((0, z_pad),)
    # resting-equilibrium pad (f = w), as the real path pads -- zero pads
    # would NaN the omega cotangent through rho = 0
    w_col = jnp.broadcast_to(jnp.asarray(vs._w, f0.dtype).reshape(-1, 1, 1, 1), f0.shape[:-1] + (z_pad,))
    f0p = jnp.concatenate([f0, w_col], axis=-1)
    mask_p = pack_masks(jnp.pad(bm, pad4, constant_values=255), jnp.pad(mm, pad4, constant_values=False))
    return vs, shape, st, f0, f1, bm, mm, f0p, mask_p


def test_zpad_dma_kernel_matches_jnp_tier():
    from xlb_tpu.kernels.fused_step import bc_to_spec
    from xlb_tpu.kernels.collide_stream_dma import build_fused_collide_stream_3d_dma

    z_pad = 104  # 24 -> 128, as the real path pads
    vs, shape, st, f0, f1, bm, mm, f0p, mask_p = _padded_setup(z_pad)
    specs = [bc_to_spec(bc, vs) for bc in st.boundary_conditions]
    fused = build_fused_collide_stream_3d_dma(
        vs, (shape[0], shape[1], shape[2] + z_pad), bc_specs=specs,
        tile=(8, 16), interpret=True, logical_z=shape[2],
    )

    out_p = fused(f0p, mask_p, jnp.float32(1.5))
    _, ref = st._step_pull(f0, f1, bm, mm, jnp.float32(1.5), 0)
    np.testing.assert_allclose(np.asarray(out_p)[..., : shape[2]], np.asarray(ref), rtol=1e-6, atol=1e-7)
    # pad columns are inert: solid keep-out re-emits the resting pad
    np.testing.assert_array_equal(
        np.asarray(out_p)[..., shape[2] :], np.asarray(f0p)[..., shape[2] :]
    )


def test_zpad_kstep_kernel_matches_k_jnp_steps():
    from xlb_tpu.kernels.fused_step import bc_to_spec
    from xlb_tpu.kernels.collide_stream_2step import build_fused_collide_stream_3d_kstep

    z_pad = 104  # 24 -> 128, as the real path pads
    vs, shape, st, f0, f1, bm, mm, f0p, mask_p = _padded_setup(z_pad)
    specs = [bc_to_spec(bc, vs) for bc in st.boundary_conditions]
    fused2 = build_fused_collide_stream_3d_kstep(
        vs, (shape[0], shape[1], shape[2] + z_pad), bc_specs=specs,
        store_dtype=jnp.float32, tile=(8, 16), steps=2, interpret=True, logical_z=shape[2],
    )

    out_p = fused2(f0p, mask_p, jnp.float32(1.5))
    ref = f0
    for _ in range(2):
        _, ref = st._step_pull(ref, f1, bm, mm, jnp.float32(1.5), 0)
    np.testing.assert_allclose(np.asarray(out_p)[..., : shape[2]], np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_zpad_adjoint_matches_jnp_vjp():
    from xlb_tpu.kernels.fused_step import bc_to_spec
    from xlb_tpu.kernels.adjoint_step import build_fused_adjoint_3d

    z_pad = 104  # 24 -> 128, as the real path pads
    vs, shape, st, f0, f1, bm, mm, f0p, mask_p = _padded_setup(z_pad)
    specs = [bc_to_spec(bc, vs) for bc in st.boundary_conditions]
    bwd = build_fused_adjoint_3d(
        vs, (shape[0], shape[1], shape[2] + z_pad), bc_specs=specs,
        tile=(8, 16), interpret=True, logical_z=shape[2],
    )

    key = jax.random.PRNGKey(1)
    g = jax.random.normal(key, f0.shape, jnp.float32)
    gp = jnp.pad(g, ((0, 0),) * 3 + ((0, z_pad),))
    df_p, dom_field = bwd(f0p, gp, mask_p, jnp.float32(1.5))
    dom = float(jnp.sum(dom_field.astype(jnp.float32)))

    def step(f, om):
        _, out = st._step_pull(f, f1, bm, mm, om, 0)
        return out

    _, vjp = jax.vjp(step, f0, jnp.float32(1.5))
    df_ref, dom_ref = vjp(g)
    np.testing.assert_allclose(np.asarray(df_p)[..., : shape[2]], np.asarray(df_ref), rtol=1e-5, atol=1e-6)
    assert abs(dom - float(dom_ref)) < 1e-3 * max(1.0, abs(float(dom_ref)))
