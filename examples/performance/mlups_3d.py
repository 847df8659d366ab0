"""MLUPS benchmark CLI (reference examples/performance/mlups_3d.py:18-120).

3D lid-driven cavity; sweeps backend tier (jax / pallas), velocity set,
collision model, and cube size; reports MLUPS with warmup + repetitions.
"""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))  # allow running as a script


import argparse
import time

import numpy as np


def benchmark(cube_edge, num_steps, backend_tier, velocity_set_name, collision, precision, warmup, reps, tile, window=False, temporal_steps=None):
    import jax
    import jax.numpy as jnp

    import xlb_tpu as xlb
    from xlb_tpu import velocity_set as vsets
    from xlb_tpu.grid import grid_factory
    from xlb_tpu.models import IncompressibleNavierStokesStepper
    from xlb_tpu.boundary import EquilibriumBC, FullwayBounceBackBC

    xlb.init(
        velocity_set=getattr(vsets, velocity_set_name)(),
        default_backend=xlb.ComputeBackend.JAX,
        default_precision_policy=xlb.PrecisionPolicy[precision],
    )
    n = cube_edge
    grid = grid_factory((n, n, n))
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)
    walls = np.unique(
        np.concatenate([np.asarray(box[k]) for k in ("bottom", "left", "right", "front", "back")], axis=1), axis=1
    )
    bcs = [
        FullwayBounceBackBC(indices=walls.tolist()),
        EquilibriumBC(rho=1.0, u=(0.02, 0.0, 0.0), indices=box_ne["top"]),
    ]
    # PowerLawBGK needs a consistency; mildly shear-thinning defaults for benching
    params = {"consistency": 0.05, "power_index": 0.8} if collision == "PowerLawBGK" else None
    stepper = IncompressibleNavierStokesStepper(
        grid, boundary_conditions=bcs, collision_type=collision, collision_params=params
    )
    f0, f1, bc_mask, missing_mask = stepper.prepare_fields()

    if backend_tier == "pallas" and window:
        # the production path: fused window (temporal blocking + shifted
        # 16-bit storage auto-selected; see kernels/fused_step.py)
        from xlb_tpu.kernels.fused_step import build_fused_window

        run_window = build_fused_window(
            stepper, num_steps, tile=tile, interpret=jax.default_backend() == "cpu",
            temporal_steps=temporal_steps, donate=True
        )
    else:
        if backend_tier == "pallas":
            from xlb_tpu.kernels.fused_step import build_fused_step

            step_fn = build_fused_step(stepper, tile=tile, interpret=jax.default_backend() == "cpu")
        else:
            step_fn = stepper

        @jax.jit
        def run_window(f0, f1, bc_mask, missing_mask, omega):
            def body(i, carry):
                a, b = carry
                a, b = step_fn(a, b, bc_mask, missing_mask, omega, i)
                return (b, a)

            return jax.lax.fori_loop(0, num_steps, body, (f0, f1))

    omega = 1.9
    f0, f1 = run_window(f0, f1, bc_mask, missing_mask, omega)
    float(jnp.sum(f0[0, 0, 0, :8].astype(jnp.float32)))  # sync
    for _ in range(max(0, warmup - 1)):
        f0, f1 = run_window(f0, f1, bc_mask, missing_mask, omega)
    float(jnp.sum(f0[0, 0, 0, :8].astype(jnp.float32)))

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        f0, f1 = run_window(f0, f1, bc_mask, missing_mask, omega)
        float(jnp.sum(f0[0, 0, 0, :8].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)

    mlups = n**3 * num_steps / best / 1e6
    mode = "window" if (backend_tier == "pallas" and window) else "per-step"
    print(
        f"{velocity_set_name} {collision} {precision} tier={backend_tier} ({mode}) {n}^3: "
        f"{mlups:.1f} MLUPS ({best / num_steps * 1e3:.3f} ms/step, {reps} reps)"
    )
    return mlups


if __name__ == "__main__":
    p = argparse.ArgumentParser(description="3D lid-driven cavity MLUPS benchmark")
    p.add_argument("cube_edge", type=int, nargs="?", default=256)
    p.add_argument("num_steps", type=int, nargs="?", default=50)
    p.add_argument("--backend", choices=["jax", "pallas"], default="pallas")
    p.add_argument("--velocity-set", choices=["D3Q19", "D3Q27"], default="D3Q19")
    p.add_argument("--collision", choices=["BGK", "KBC", "SmagorinskyLESBGK", "TRT", "MRT", "PowerLawBGK"], default="BGK")
    p.add_argument("--precision", default="FP32FP32")
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--tile", type=int, nargs=2, default=None, help="(TX, TY); default: auto (8, 64)-style")
    p.add_argument("--window", action="store_true", help="run the fused window (temporal blocking + shifted storage)")
    p.add_argument("--temporal-steps", type=int, default=None, help="LBM steps per HBM pass in --window mode (default 2)")
    args = p.parse_args()
    benchmark(
        args.cube_edge,
        args.num_steps,
        args.backend,
        args.velocity_set,
        args.collision,
        args.precision,
        args.warmup,
        args.reps,
        tuple(args.tile) if args.tile else None,
        window=args.window,
        temporal_steps=args.temporal_steps,
    )
