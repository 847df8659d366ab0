"""2D MLUPS benchmark CLI (companion to mlups_3d.py).

2D lid-driven cavity, D2Q9; the fused window exploits the 2D kernel's
nearly-free temporal blocking (k steps per HBM fetch,
kernels/collide_stream_2d.py) -- 11.1 GLUPS at 2048^2 k=8 on one v5e chip
(docs/performance.md has the k sweep).
"""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))  # allow running as a script

import argparse
import time

import numpy as np


def benchmark(n, num_steps, backend_tier, precision, warmup, reps, temporal_steps=None):
    import jax
    import jax.numpy as jnp

    import xlb_tpu as xlb
    from xlb_tpu.velocity_set import D2Q9
    from xlb_tpu.grid import grid_factory
    from xlb_tpu.models import IncompressibleNavierStokesStepper
    from xlb_tpu.boundary import EquilibriumBC, FullwayBounceBackBC

    xlb.init(
        velocity_set=D2Q9(),
        default_backend=xlb.ComputeBackend.JAX,
        default_precision_policy=xlb.PrecisionPolicy[precision],
    )
    grid = grid_factory((n, n))
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)
    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in ("bottom", "left", "right")], axis=1), axis=1)
    bcs = [
        FullwayBounceBackBC(indices=walls.tolist()),
        EquilibriumBC(rho=1.0, u=(0.02, 0.0), indices=box_ne["top"]),
    ]
    stepper = IncompressibleNavierStokesStepper(grid, boundary_conditions=bcs)
    f0, f1, bc_mask, missing_mask = stepper.prepare_fields()

    if backend_tier == "pallas":
        from xlb_tpu.kernels.fused_step import build_fused_window

        run_window = build_fused_window(
            stepper, num_steps, interpret=jax.default_backend() == "cpu", temporal_steps=temporal_steps
        )
    else:

        @jax.jit
        def run_window(f0, f1, bc_mask, missing_mask, omega):
            def body(i, carry):
                a, b = carry
                a, b = stepper(a, b, bc_mask, missing_mask, omega, i)
                return (b, a)

            return jax.lax.fori_loop(0, num_steps, body, (f0, f1))

    omega = 1.6
    f0, f1 = run_window(f0, f1, bc_mask, missing_mask, omega)
    float(jnp.sum(f0[0, :2, :2].astype(jnp.float32)))  # sync
    for _ in range(max(0, warmup - 1)):
        f0, f1 = run_window(f0, f1, bc_mask, missing_mask, omega)
    float(jnp.sum(f0[0, :2, :2].astype(jnp.float32)))

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        f0, f1 = run_window(f0, f1, bc_mask, missing_mask, omega)
        float(jnp.sum(f0[0, :2, :2].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)

    mlups = n * n * num_steps / best / 1e6
    print(
        f"D2Q9 BGK {precision} tier={backend_tier} {n}^2: "
        f"{mlups:.1f} MLUPS ({best / num_steps * 1e3:.3f} ms/step, {reps} reps)"
    )
    return mlups


if __name__ == "__main__":
    p = argparse.ArgumentParser(description="2D lid-driven cavity MLUPS benchmark")
    p.add_argument("edge", type=int, nargs="?", default=2048)
    p.add_argument("num_steps", type=int, nargs="?", default=500)
    p.add_argument("--backend", choices=["jax", "pallas"], default="pallas")
    p.add_argument("--precision", default="FP32FP32")
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--temporal-steps", type=int, default=None, help="LBM steps per HBM fetch (default 8)")
    args = p.parse_args()
    benchmark(args.edge, args.num_steps, args.backend, args.precision, args.warmup, args.reps, args.temporal_steps)
