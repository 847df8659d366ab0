"""Checkpoint/resume tests: a restored run continues bit-identically."""

import numpy as np
import pytest

from tests.conftest import init_env
from xlb_tpu.velocity_set import D2Q9
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.boundary import EquilibriumBC, HalfwayBounceBackBC

pytestmark = pytest.mark.fast  # whole-module smoke tier (sub-5-min suite)


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
