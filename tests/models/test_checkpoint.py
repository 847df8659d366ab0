"""Checkpoint/resume tests: a restored run continues bit-identically."""

import numpy as np
import pytest

from tests.conftest import init_env
from xlb_tpu.velocity_set import D2Q9
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.boundary import EquilibriumBC, HalfwayBounceBackBC



def _cavity(n=16):
    grid = grid_factory((n, n))
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)
    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in ("bottom", "left", "right")], axis=1), axis=1)
    bcs = [HalfwayBounceBackBC(indices=walls.tolist()), EquilibriumBC(rho=1.0, u=(0.05, 0.0), indices=box_ne["top"])]
    return IncompressibleNavierStokesStepper(grid, boundary_conditions=bcs)


def test_checkpoint_resume_bit_identical(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from xlb_tpu.utils.checkpoint import SimulationCheckpointer

    vs = init_env(D2Q9)
    stepper = _cavity()
    f0, f1, bm, mm = stepper.prepare_fields()

    # run 10 steps straight
    fa, fb = f0, f1
    for t in range(10):
        fa, fb = stepper(fa, fb, bm, mm, 1.4, t)
        fa, fb = fb, fa

    # run 5, checkpoint, restore into a NEW manager, run 5 more
    ga, gb = f0, f1
    for t in range(5):
        ga, gb = stepper(ga, gb, bm, mm, 1.4, t)
        ga, gb = gb, ga
    ckpt = SimulationCheckpointer(str(tmp_path / "ck"), async_save=False)
    ckpt.save(5, wait=True, f_0=ga, f_1=gb, bc_mask=bm, missing_mask=mm, omega=1.4)
    ckpt.close()

    ckpt2 = SimulationCheckpointer(str(tmp_path / "ck"), async_save=False)
    assert ckpt2.latest_step() == 5
    state = ckpt2.restore(template={"f_0": ga, "f_1": gb, "bc_mask": bm, "missing_mask": mm, "omega": 1.4})
    ha, hb = state["f_0"], state["f_1"]
    for t in range(5, 10):
        ha, hb = stepper(ha, hb, state["bc_mask"], state["missing_mask"], state["omega"], t)
        ha, hb = hb, ha
    np.testing.assert_array_equal(np.asarray(ha), np.asarray(fa))
    ckpt2.close()


@pytest.mark.fast
def test_checkpoint_sharded_async_roundtrip(tmp_path):
    """The 'distributed asynchronous' half of the reference README's
    checkpointing promise (README.md:205 -- promised there, implemented
    here): an async save of MESH-SHARDED state restores onto the same
    shardings bit-identically, and the restored run continues exactly."""
    pytest.importorskip("orbax.checkpoint")
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from xlb_tpu.utils.checkpoint import SimulationCheckpointer

    vs = init_env(D2Q9)
    stepper = _cavity(n=16)
    f0, f1, bm, mm = stepper.prepare_fields()
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("x",))
    spec = NamedSharding(mesh, P(None, "x"))
    f0 = jax.device_put(f0, spec)
    f1 = jax.device_put(f1, spec)

    fa, fb = f0, f1
    for t in range(3):
        fa, fb = stepper(fa, fb, bm, mm, 1.4, t)
        fa, fb = fb, fa
    fa = jax.device_put(fa, spec)  # pin the layout the template will carry

    ckpt = SimulationCheckpointer(str(tmp_path / "ck"), async_save=True)
    ckpt.save(3, f_0=fa, f_1=fb, omega=1.4)  # async: returns before I/O completes
    ckpt.wait()
    ckpt.close()

    ckpt2 = SimulationCheckpointer(str(tmp_path / "ck"))
    state = ckpt2.restore(template={"f_0": fa, "f_1": fb, "omega": 1.4})
    ra = state["f_0"]
    assert ra.sharding.is_equivalent_to(fa.sharding, ra.ndim), "restore dropped the mesh sharding"
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(fa))

    # restored run continues bit-identically to the uninterrupted one
    ca, cb = fa, fb
    ra, rb = state["f_0"], state["f_1"]
    for t in range(3, 6):
        ca, cb = stepper(ca, cb, bm, mm, 1.4, t)
        ca, cb = cb, ca
        ra, rb = stepper(ra, rb, bm, mm, state["omega"], t)
        ra, rb = rb, ra
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(ca))
    ckpt2.close()
