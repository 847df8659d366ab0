"""Multi-chip execution of the fused Pallas step.

Each shard exchanges its one-deep x-halo of populations with its ring
neighbors over ICI (lax.ppermute), then runs the halo-aware fused kernel on
the locally-extended array.  This is the fused-kernel counterpart of the
jnp tier's distribute() wrapper -- unlike post-hoc edge patching (which only
works when streaming is the final op), the fused step needs globally-correct
neighbor populations *before* collide, hence exchange-first.
"""

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map

from xlb_tpu.kernels.fused_step import bc_to_spec, pack_masks
from xlb_tpu.kernels.collide_stream_dma import build_fused_collide_stream_3d_dma


def build_distributed_fused_step(stepper, grid, tile=(8, 16), interpret=None):
    """Returns (f_0, f_1, bc_mask, missing_mask, omega, timestep) -> (f_0, f_1)
    running the fused kernel per shard with ICI halo exchange on x.

    Requires the grid to be sharded on x only (the reference's decomposition,
    jax_grid.py:24-26); generalizing the exchange to y is symmetric.
    """
    if any(p > 1 for p in grid.mesh_shape[1:]):
        raise NotImplementedError("fused multi-chip path currently shards x only")
    n_shards = grid.mesh_shape[0]
    vs = stepper.velocity_set
    pp = stepper.precision_policy
    local_shape = (grid.shape[0] // n_shards,) + grid.shape[1:]

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    fused = build_fused_collide_stream_3d_dma(
        vs,
        local_shape,
        collision=stepper.collision_type,
        bc_specs=[bc_to_spec(bc, vs) for bc in stepper.boundary_conditions],
        compute_dtype=pp.compute_dtype,
        store_dtype=pp.store_dtype,
        tile=tile,
        interpret=interpret,
        halo_x=True,
    )

    right_perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    left_perm = [((i + 1) % n_shards, i) for i in range(n_shards)]

    def _local(f, mask_i32, omega):
        # one-deep halo exchange over ICI: this shard needs the left
        # neighbor's last layer and the right neighbor's first layer
        from_left = lax.ppermute(f[:, -1:], perm=right_perm, axis_name="x")
        from_right = lax.ppermute(f[:, :1], perm=left_perm, axis_name="x")
        f_ext = jnp.concatenate([from_left, f, from_right], axis=1)
        return fused(f_ext, mask_i32, omega)

    mesh = grid.global_mesh
    fspec = grid.field_spec
    from jax.sharding import PartitionSpec as P

    mask_spec = P(*grid.axis_names)

    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(fspec, mask_spec, P()),
        out_specs=fspec,
        # pallas_call out_shapes carry no varying-mesh-axes info
        check_vma=False,
    )

    def step(f_0, f_1, bc_mask, missing_mask, omega, timestep=0):
        mask_i32 = pack_masks(bc_mask, missing_mask)
        omega_arr = jnp.asarray(omega, dtype=pp.compute_dtype)
        return f_0, sharded(f_0, mask_i32, omega_arr)

    return step
