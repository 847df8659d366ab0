"""Schafer-Turek 2D-2 cylinder benchmark: quantitative Cd / Cl / Strouhal.

The definitive quantitative benchmark for 2D unsteady flow past a cylinder
(Schafer & Turek, "Benchmark computations of laminar flow around a
cylinder", 1996): a channel of height H = 4.1 D and length 22 D, cylinder
of diameter D centered at (2 D, 2 D) -- deliberately 0.05 D below the
channel centerline so the vortex street starts deterministically -- with a
PARABOLIC inlet profile (mean velocity U, Re = U D / nu = 100).  Reference
intervals from the benchmark compilation (lower/upper bounds over all
participating codes):

    Cd_max in [3.2200, 3.2400]
    Cl_max in [0.9900, 1.0100]
    St     in [0.2950, 0.3050]

The reference repo reports only a qualitative vortex street for its
cylinder flows (no counterpart of this validation).  The spatial parabolic
inlet exercises the per-voxel prescribed-velocity path (aux channels in
the fused tier); drag/lift use the momentum-exchange method
(ops/force.py::MomentumTransfer, reference momentum_transfer.py:180-212).

The cylinder wall defaults to HybridBC interpolated bounce-back with EXACT
per-link circle distances (geometry/distances.py::implicit_link_distances;
the reference's curved-BC machinery, bc_hybrid.py:39-391, is Warp/3D-only
so it cannot run this 2D case at all).  Measured on one TPU v5e (jnp tier,
f32):

    default (D=60, U=0.035, hybrid):  Cd_max 3.2253  Cl_max 0.9964  St 0.2994
        -- ALL THREE inside the published intervals.
    D=40, U=0.05,  hybrid:            Cd_max 3.2379  Cl_max 1.0104  St 0.2979
    D=60, U=0.025, hybrid:            Cd_max 3.2093  Cl_max 0.9903  St 0.2994
    D=60, U=0.05,  staircase:         Cd_max 3.310   Cl_max 1.063   St 0.2983

The sweep separates the two error terms: the staircase wall carries a
+2-3% bias that the curved-wall distances remove; what remains is the
compressibility bias (+~Ma^2, pushes UP, see U=0.05) against the
second-order discretization error (pushes DOWN, see U=0.025), which
balance inside the intervals at the default (D=60, U=0.035).
Asserted in-suite by tests/models/test_schafer_turek.py (real-chip tier).
"""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[2]))

import argparse

import numpy as np

import xlb_tpu as xlb
from xlb_tpu.velocity_set import D2Q9
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.boundary import RegularizedBC, HalfwayBounceBackBC, HybridBC
from xlb_tpu.geometry.distances import implicit_link_distances
from xlb_tpu.ops import MomentumTransfer


def run(d=60, re=100.0, u_mean=0.035, transient_periods=60, measure_periods=15,
        collision="BGK", cylinder_bc="hybrid", hybrid_method="bounceback", verbose=True):
    """Returns (cd_max, cl_max, strouhal) over the measurement window."""
    import jax
    import jax.numpy as jnp

    xlb.init(velocity_set=D2Q9(), default_backend=xlb.ComputeBackend.JAX,
             default_precision_policy=xlb.PrecisionPolicy.FP32FP32)

    # exact benchmark geometry in units of D: channel [0, 22] x [0, 4.1],
    # cylinder center (2, 2) -- i.e. 2.1 D below the top wall.  Halfway
    # bounce-back puts the physical walls half a cell inside the outermost
    # rows, so ny - 2 lattice units span exactly 4.1 D; the inlet plane is
    # the x = 0 node column (Zou-He/regularized prescribe u ON the node).
    nx, ny = int(22.0 * d) + 1, int(4.1 * d) + 2
    cx, cy = 2.0 * d, 2.0 * d + 0.5  # lattice coords of the center

    # validation runs single-device (the odd benchmark extents do not divide
    # a device mesh; use channel_3d_distributed.py for multi-chip patterns)
    grid = grid_factory((nx, ny), mesh_shape=(1, 1), devices=jax.devices()[:1])
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)

    X, Y = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    inside = (X - cx) ** 2 + (Y - cy) ** 2 <= (d / 2.0) ** 2
    cyl_idx = np.array(np.nonzero(inside))

    walls = np.unique(np.concatenate([np.asarray(box["bottom"]), np.asarray(box["top"])], axis=1), axis=1)

    # parabolic inlet: u(y) = 4 u_max y (H - y) / H^2 with u_max = 1.5 u_mean,
    # y measured from the physical walls (halfway between wall & fluid rows)
    u_max = 1.5 * u_mean
    y_phys = np.arange(ny) - 0.5
    H = ny - 2.0
    prof = 4.0 * u_max * y_phys * (H - y_phys) / H**2
    prof = np.clip(prof, 0.0, None)
    prescribed = np.zeros((2, 1, ny))
    prescribed[0, 0] = prof

    if cylinder_bc == "staircase":
        bc_cyl = HalfwayBounceBackBC(indices=cyl_idx.tolist())
    else:
        # curved wall: interpolated bounce-back with EXACT per-link circle
        # crossings (the 2D analytic analogue of the reference's 3D-only
        # Warp ray-cast distances, bc_hybrid.py:39-391 + ray.py:62-77)
        bc_cyl = HybridBC(bc_method=hybrid_method, indices=cyl_idx.tolist())
        shell = bc_cyl.pad_indices()

        def inside(pts):
            return (pts[:, 0] - cx) ** 2 + (pts[:, 1] - cy) ** 2 <= (d / 2.0) ** 2

        bc_cyl.set_link_distances(
            shell, implicit_link_distances(inside, shell.astype(np.float64), bc_cyl.velocity_set._c)
        )
    bcs = [
        HalfwayBounceBackBC(indices=walls.tolist()),
        RegularizedBC("velocity", profile=lambda: prescribed, indices=box_ne["left"]),
        RegularizedBC("pressure", prescribed_value=1.0, indices=box_ne["right"]),
        bc_cyl,
    ]
    stepper = IncompressibleNavierStokesStepper(grid, boundary_conditions=bcs, collision_type=collision)
    from xlb_tpu.helper.initializers import CustomInitializer

    f_0, f_1, bc_mask, missing_mask = stepper.prepare_fields(
        initializer=CustomInitializer(rho_0=1.0, u_0=(u_mean, 0.0))
    )
    mt = MomentumTransfer(bc_cyl)

    nu = u_mean * d / re
    omega = 1.0 / (3.0 * nu + 0.5)
    # nominal shedding period in steps (St ~ 0.3) sets the run lengths
    period = int(d / (0.3 * u_mean))
    n_transient = transient_periods * period
    n_measure = measure_periods * period

    def make_window(n_steps, record):
        def body(carry, t):
            f0, f1 = carry
            a, b = stepper(f0, f1, bc_mask, missing_mask, omega, t)
            f0, f1 = b, a
            out = mt(f0, f1, bc_mask, missing_mask) if record else 0.0
            return (f0, f1), out

        @jax.jit
        def window(f0, f1):
            (f0, f1), forces = jax.lax.scan(body, (f0, f1), jnp.arange(n_steps))
            return f0, f1, forces

        return window

    chunk = 10 * period
    warm = make_window(chunk, record=False)
    for _ in range(max(1, n_transient // chunk)):
        f_0, f_1, _ = warm(f_0, f_1)
    measure = make_window(n_measure, record=True)
    f_0, f_1, forces = measure(f_0, f_1)
    forces = np.asarray(forces)  # (n_measure, 2)

    coef = 2.0 / (u_mean**2 * d)  # rho = 1
    cd, cl = coef * forces[:, 0], coef * forces[:, 1]
    cd_max, cl_max = float(cd.max()), float(cl.max())

    # Strouhal from the mean interval between rising zero crossings of Cl
    sgn = np.signbit(cl - cl.mean())
    rising = np.nonzero(sgn[:-1] & ~sgn[1:])[0]
    assert len(rising) >= 3, "no periodic lift signal -- shedding not established"
    steps_per_period = float(np.diff(rising).mean())
    strouhal = d / (steps_per_period * u_mean)

    if verbose:
        print(f"Schafer-Turek 2D-2 (D={d}, {nx}x{ny}, Re={re}, {collision}, cylinder={cylinder_bc}):")
        print(f"  Cd_max = {cd_max:.4f}   (benchmark 3.2200 - 3.2400)")
        print(f"  Cl_max = {cl_max:.4f}   (benchmark 0.9900 - 1.0100)")
        print(f"  St     = {strouhal:.4f}   (benchmark 0.2950 - 0.3050)")
        ok = abs(cd_max - 3.23) < 0.15 and abs(cl_max - 1.0) < 0.15 and abs(strouhal - 0.30) < 0.015
        print(f"  within 5% (Cd, Cl: 15%) of the benchmark values: {'PASS' if ok else 'FAIL'}")
    return cd_max, cl_max, strouhal


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--d", type=int, default=60, help="cylinder diameter in lattice units")
    p.add_argument("--u-mean", type=float, default=0.035, help="mean inlet velocity (lattice units)")
    p.add_argument("--re", type=float, default=100.0)
    p.add_argument("--collision", default="BGK")
    p.add_argument("--cylinder-bc", default="hybrid", choices=["staircase", "hybrid"])
    p.add_argument("--hybrid-method", default="bounceback",
                   choices=["bounceback", "bounceback_regularized", "bounceback_grads", "nonequilibrium_regularized"])
    p.add_argument("--transient-periods", type=int, default=60)
    p.add_argument("--measure-periods", type=int, default=15)
    args = p.parse_args()
    run(d=args.d, re=args.re, u_mean=args.u_mean, collision=args.collision,
        cylinder_bc=args.cylinder_bc, hybrid_method=args.hybrid_method,
        transient_periods=args.transient_periods, measure_periods=args.measure_periods)
