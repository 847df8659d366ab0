"""Differentiable out-of-core LBM: gradient-descent the INITIAL flow state
so the FINAL density matches a target pattern, on a domain that streams
through the device in host-RAM slabs
(reference examples/out_of_core/autodiff_lbm.py: Warp adjoint subroutines
walking host checkpoints; here the same capability is the slab-exact
host-checkpointed adjoint of xlb_tpu/experimental/ooc_adjoint.py).

The target is a procedural disc of excess density centered in the box.
Each optimization iteration runs the forward sweeps (snapshotting
checkpoints to host RAM), evaluates the voxel-local L2 density loss
tile-by-tile, then walks the adjoint back sweep-by-sweep -- device memory
holds only one padded slab at a time in both directions.
"""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))  # allow running as a script

import argparse
import time

import numpy as np
import jax.numpy as jnp

import xlb_tpu as xlb
from xlb_tpu.velocity_set import D2Q9
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.boundary import FullwayBounceBackBC
from xlb_tpu.experimental.ooc_adjoint import OOCAdjointSolver


def run(n=128, num_tiles=4, num_sweeps=4, steps_per_sweep=2, iters=8, lr=2.0, omega=1.6):
    xlb.init(velocity_set=D2Q9(), default_backend=xlb.ComputeBackend.JAX,
             default_precision_policy=xlb.PrecisionPolicy.FP32FP32)
    grid = grid_factory((n, n))
    box = grid.bounding_box_indices()
    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in box], axis=1), axis=1)
    stepper = IncompressibleNavierStokesStepper(
        grid, boundary_conditions=[FullwayBounceBackBC(indices=walls.tolist())]
    )

    # target: a disc of +0.5% density at the center, radius n/6
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="xy")
    disc = ((xx - n / 2) ** 2 + (yy - n / 2) ** 2 < (n / 6) ** 2).T
    target = (1.0 + 0.005 * disc).astype(np.float32)
    target_dev = jnp.asarray(target)
    tile_ext = n // num_tiles

    def make_loss(i):
        tgt = target_dev[i * tile_ext : (i + 1) * tile_ext]

        def loss_tile(f_tile):
            rho = jnp.sum(f_tile, axis=0)
            return jnp.sum((rho - tgt) ** 2)

        return loss_tile

    solver = OOCAdjointSolver(stepper, num_tiles=num_tiles, steps_per_sweep=steps_per_sweep).prepare()
    f = solver.f.data.copy()

    print(f"OOC autodiff {n}^2, {num_tiles} slabs, {num_sweeps * steps_per_sweep} steps/rollout, {iters} GD iters")
    tile_losses = [make_loss(i) for i in range(num_tiles)]
    losses = []
    for it in range(iters):
        t0 = time.perf_counter()
        loss, grad = solver.loss_and_grad(tile_losses, num_sweeps, omega, f_init=f)
        losses.append(loss)
        # backtracking: shrink the step until the loss actually decreases
        while lr > 1e-6:
            trial = f - lr * grad.astype(f.dtype)
            trial_loss = solver.loss_only(tile_losses, num_sweeps, omega, f_init=trial)
            if np.isfinite(trial_loss) and trial_loss < loss:
                f, lr = trial, lr * 1.3  # gentle growth after a success
                break
            lr *= 0.5
        print(f"  iter {it}: loss {loss:.3e}  |grad| {np.abs(grad).max():.2e}  lr {lr:.2e}  ({time.perf_counter() - t0:.1f} s)")
    assert losses[-1] < losses[0], "optimization failed to reduce the loss"
    print(f"loss {losses[0]:.3e} -> {losses[-1]:.3e}")
    return np.asarray(losses)


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--n", type=int, default=128)
    p.add_argument("--tiles", type=int, default=4)
    p.add_argument("--sweeps", type=int, default=4)
    p.add_argument("--steps-per-sweep", type=int, default=2)
    p.add_argument("--iters", type=int, default=8)
    a = p.parse_args()
    run(n=a.n, num_tiles=a.tiles, num_sweeps=a.sweeps, steps_per_sweep=a.steps_per_sweep, iters=a.iters)
