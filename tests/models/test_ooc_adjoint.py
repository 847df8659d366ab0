"""Differentiable OOC: the host-checkpointed slab adjoint matches in-core
jax.grad (reference capability: examples/out_of_core/autodiff_lbm.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.conftest import init_env
from xlb_tpu.velocity_set import D2Q9
from xlb_tpu.grid import grid_factory
from xlb_tpu.models import IncompressibleNavierStokesStepper
from xlb_tpu.boundary import EquilibriumBC, HalfwayBounceBackBC
from xlb_tpu.boundary.registry import boundary_condition_registry
from xlb_tpu.experimental.ooc_adjoint import OOCAdjointSolver


def _cavity(n=32):
    grid = grid_factory((n, n), mesh_shape=(1, 1), devices=jax.devices()[:1])
    box = grid.bounding_box_indices()
    box_ne = grid.bounding_box_indices(remove_edges=True)
    walls = np.unique(np.concatenate([np.asarray(box[k]) for k in ("bottom", "left", "right")], axis=1), axis=1)
    bcs = [HalfwayBounceBackBC(indices=walls.tolist()), EquilibriumBC(rho=1.0, u=(0.05, 0.0), indices=box_ne["top"])]
    return IncompressibleNavierStokesStepper(grid, boundary_conditions=bcs)


def _loss_tile(f_tile):
    # voxel-local L2 on density against a constant target
    rho = jnp.sum(f_tile, axis=0)
    return jnp.sum((rho - 1.001) ** 2)


def test_ooc_adjoint_matches_in_core_grad():
    vs = init_env(D2Q9)
    n, steps = 32, 6
    stepper = _cavity(n)
    f0, f1, bm, mm = stepper.prepare_fields()
    f0_np = np.asarray(f0)

    # in-core reference gradient
    def loss_fn(f):
        def body(t, carry):
            a, b = carry
            a, b = stepper(a, b, bm, mm, 1.5, t)
            return (b, a)

        a, _ = jax.lax.fori_loop(0, steps, body, (f, f))
        return _loss_tile(a)

    ref_loss, ref_grad = jax.value_and_grad(loss_fn)(jnp.asarray(f0_np))

    # OOC: 4 tiles, 2 steps/sweep, 3 sweeps, checkpoint every other sweep
    boundary_condition_registry.reset()
    stepper2 = _cavity(n)
    solver = OOCAdjointSolver(stepper2, num_tiles=4, steps_per_sweep=2, checkpoint_every=2).prepare()
    loss, grad = solver.loss_and_grad(_loss_tile, num_sweeps=3, omega=1.5, f_init=f0_np)

    assert abs(loss - float(ref_loss)) < 1e-6 * max(1.0, abs(float(ref_loss)))
    np.testing.assert_allclose(grad, np.asarray(ref_grad), rtol=1e-5, atol=1e-7)
    # side-effect free: the solver's field is back at the initial state
    np.testing.assert_array_equal(solver.f.data, f0_np)


def test_ooc_adjoint_gradient_descent_reduces_loss():
    """Three GD iterations on the initial populations reduce the density-
    matching loss (the reference example's optimization loop in miniature)."""
    vs = init_env(D2Q9)
    stepper = _cavity(16)
    f0, *_ = stepper.prepare_fields()
    f = np.asarray(f0)
    solver = OOCAdjointSolver(stepper, num_tiles=2, steps_per_sweep=2).prepare()

    losses = []
    for _ in range(3):
        loss, grad = solver.loss_and_grad(_loss_tile, num_sweeps=2, omega=1.5, f_init=f)
        losses.append(loss)
        f = f - 0.05 * grad.astype(f.dtype)
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_ooc_adjoint_fused_tier_matches_jnp_tier():
    """tier="fused" differentiates through the Pallas step's custom_vjp
    (interpret mode on CPU); gradients match the jnp tier to roundoff.
    slab extent 8 + 2*4 = 16 satisfies the 2D kernel 8 | tile_x | X rule."""
    vs = init_env(D2Q9)
    n = 16
    stepper = _cavity(n)
    f0, *_ = stepper.prepare_fields()
    f0_np = np.asarray(f0)

    boundary_condition_registry.reset()
    s_jnp = _cavity(n)
    a = OOCAdjointSolver(s_jnp, num_tiles=2, steps_per_sweep=4, tier="jnp").prepare()
    loss_a, grad_a = a.loss_and_grad(_loss_tile, num_sweeps=1, omega=1.5, f_init=f0_np)

    boundary_condition_registry.reset()
    s_fused = _cavity(n)
    b = OOCAdjointSolver(s_fused, num_tiles=2, steps_per_sweep=4, tier="fused").prepare()
    loss_b, grad_b = b.loss_and_grad(_loss_tile, num_sweeps=1, omega=1.5, f_init=f0_np)

    assert abs(loss_a - loss_b) < 1e-6 * max(1.0, abs(loss_a))
    # atol 1e-6: the fused kernel's pair-shared equilibrium reassociates the
    # feq sum, so vjp roundoff on near-zero gradient entries differs from the
    # jnp tier by up to ~6e-7 absolute (~2% relative on O(3e-5) elements)
    np.testing.assert_allclose(grad_b, grad_a, rtol=1e-4, atol=1e-6)
