"""Collision operators: BGK, KBC, Smagorinsky-LES BGK, and forced wrapping.

Math parity with reference xlb/operator/collision/{bgk,kbc,
smagorinsky_les_bgk,forced_collision}.py, written as pure-jnp functions that
XLA fuses into the surrounding step.
"""

import jax.numpy as jnp

from xlb_tpu.operator import Operator
from xlb_tpu.ops.macroscopic import momentum_flux, Macroscopic
from xlb_tpu.ops.force import ExactDifference


def bgk_collide(f, feq, omega):
    """Single-relaxation-time BGK: f - omega (f - feq) (reference bgk.py:28-33)."""
    return f - omega * (f - feq)


# ---------------------------------------------------------------------------
# KBC (Karlin-Boesch-Chikatamarla) entropic two-relaxation collision
# (reference kbc.py:41-174)
# ---------------------------------------------------------------------------

# shear-mode assignment tables: direction index -> (coefficient id, sign)
# derived from the reference's explicit population assignments
# (kbc.py:96-145 for D3Q27, kbc.py:147-174 for D2Q9).


def _kbc_shear_d2q9(pi):
    """Shear part of fneq for D2Q9; pi = (Pi_xx, Pi_xy, Pi_yy)."""
    n = pi[0] - pi[2]
    s = [None] * 9
    zeros = jnp.zeros_like(n)
    s[0] = zeros
    s[3] = n
    s[6] = n
    s[2] = -n
    s[1] = -n
    s[8] = pi[1]
    s[4] = -pi[1]
    s[5] = -pi[1]
    s[7] = pi[1]
    return jnp.stack(s)


def _kbc_shear_d3q27(pi):
    """Shear part of fneq for D3Q27.

    pi packs (xx, xy, xz, yy, yz, zz); N_xz = Pi_xx - Pi_zz etc.
    """
    nxz = pi[0] - pi[5]
    nyz = pi[3] - pi[5]
    zeros = jnp.zeros_like(nxz)
    s = [zeros] * 27
    # axis-aligned directions
    s[9] = s[18] = (2.0 * nxz - nyz) / 6.0
    s[3] = s[6] = (-nxz + 2.0 * nyz) / 6.0
    s[1] = s[2] = (-nxz - nyz) / 6.0
    # (i, j, 0) diagonals
    s[12] = s[24] = pi[1] / 4.0
    s[21] = s[15] = -pi[1] / 4.0
    # (i, 0, k) diagonals
    s[10] = s[20] = pi[2] / 4.0
    s[19] = s[11] = -pi[2] / 4.0
    # (0, j, k) diagonals
    s[8] = s[4] = pi[4] / 4.0
    s[7] = s[5] = -pi[4] / 4.0
    return jnp.stack(s)


def kbc_collide(f, feq, omega, cc, d, epsilon=1e-32):
    """Entropic KBC collision (reference kbc.py:41-94)."""
    fneq = f - feq
    pi = momentum_flux(fneq, cc, f.dtype)
    if d == 2:
        delta_s = _kbc_shear_d2q9(pi) / 4.0
    elif d == 3:
        delta_s = _kbc_shear_d3q27(pi)
    else:
        raise ValueError(f"KBC requires D2Q9 or D3Q27, got d={d}")

    beta = 0.5 * omega
    inv_beta = 1.0 / beta
    delta_h = fneq - delta_s
    # entropic scalar products <ds, dh>_feq and <dh, dh>_feq
    temp = delta_h / feq
    sp1 = jnp.sum(temp * delta_s, axis=0)
    sp2 = jnp.sum(temp * delta_h, axis=0)
    gamma = inv_beta - (2.0 - inv_beta) * sp1 / (epsilon + sp2)
    return f - beta * (2.0 * delta_s + gamma[None, ...] * delta_h)


def smagorinsky_collide(f, feq, omega, cc, d, smagorinsky_coef=0.17):
    """BGK with Smagorinsky eddy-viscosity correction
    (reference smagorinsky_les_bgk.py:44-66):

        tau_eff = (tau0 + sqrt(tau0^2 + 36 Cs^2 sqrt(S))) / 2
    """
    fneq = f - feq
    pi_neq = momentum_flux(fneq, cc, f.dtype)
    if d == 3:
        diag, offdiag = (0, 3, 5), (1, 2, 4)
    else:
        diag, offdiag = (0, 2), (1,)
    strain = jnp.sum(pi_neq[diag, ...] ** 2, axis=0) + 2.0 * jnp.sum(pi_neq[offdiag, ...] ** 2, axis=0)
    tau0 = 1.0 / omega
    cs = smagorinsky_coef
    tau = 0.5 * (tau0 + jnp.sqrt(tau0 * tau0 + 36.0 * cs * cs * jnp.sqrt(strain)))
    return f - (1.0 / tau)[None, ...] * fneq


# ---------------------------------------------------------------------------
# Operator wrappers
# ---------------------------------------------------------------------------


class Collision(Operator):
    """Base class for collision operators."""


class BGK(Collision):
    def __call__(self, f, feq, omega):
        return bgk_collide(f, feq, self.compute_dtype(omega))


class KBC(Collision):
    epsilon = 1e-32

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if self.velocity_set.q not in (9, 27):
            raise NotImplementedError(f"KBC supports D2Q9 and D3Q27 only, got {self.velocity_set}")

    def __call__(self, f, feq, omega):
        return kbc_collide(f, feq, self.compute_dtype(omega), self.velocity_set._cc, self.velocity_set.d, self.epsilon)


class SmagorinskyLESBGK(Collision):
    def __init__(self, velocity_set=None, precision_policy=None, compute_backend=None, smagorinsky_coef=0.17):
        super().__init__(velocity_set, precision_policy, compute_backend)
        self.smagorinsky_coef = float(smagorinsky_coef)

    def __call__(self, f, feq, omega):
        return smagorinsky_collide(
            f, feq, self.compute_dtype(omega), self.velocity_set._cc, self.velocity_set.d, self.smagorinsky_coef
        )


class ForcedCollision(Collision):
    """Wraps a collision operator with an external body force applied after it
    (reference forced_collision.py:19-58)."""

    def __init__(self, collision_operator, forcing_scheme="exact_difference", force_vector=None):
        assert collision_operator is not None
        self.collision_operator = collision_operator
        super().__init__(
            velocity_set=collision_operator.velocity_set,
            precision_policy=collision_operator.precision_policy,
            compute_backend=collision_operator.compute_backend,
        )
        if forcing_scheme != "exact_difference":
            raise NotImplementedError(f"forcing scheme {forcing_scheme!r} not implemented")
        self.force_vector = force_vector
        self.forcing_operator = ExactDifference(
            force_vector,
            velocity_set=self.velocity_set,
            precision_policy=self.precision_policy,
            compute_backend=self.compute_backend,
        )
        self.macroscopic = Macroscopic(self.velocity_set, self.precision_policy, self.compute_backend)

    def __call__(self, f, feq, omega):
        fout = self.collision_operator(f, feq, omega)
        rho, u = self.macroscopic(fout)
        return self.forcing_operator(fout, feq, rho, u)
