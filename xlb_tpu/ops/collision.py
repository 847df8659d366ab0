"""Collision operators: BGK, KBC, Smagorinsky-LES BGK, TRT, MRT, and forced
wrapping.

Math parity with reference xlb/operator/collision/{bgk,kbc,
smagorinsky_les_bgk,forced_collision}.py, written as pure-jnp functions that
XLA fuses into the surrounding step.  TRT (two-relaxation-time, Ginzburg) and
MRT (multiple-relaxation-time, d'Humieres) have no reference counterpart --
they extend the collision zoo beyond the reference's BGK/KBC/LES set.
"""

import numpy as np
import jax.numpy as jnp

from xlb_tpu.operator import Operator
from xlb_tpu.ops.macroscopic import momentum_flux, Macroscopic
from xlb_tpu.ops.force import ExactDifference
from xlb_tpu.ops.stencil_math import stencil_contract


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


def power_law_collide(f, feq, omega, cc, d, consistency, power_index, iterations=5):
    """BGK with a power-law (Ostwald-de Waele) generalized-Newtonian
    viscosity: nu(gamma) = K gamma^(n-1) with shear rate gamma.

    Like the Smagorinsky operator, the local shear rate comes from the
    non-equilibrium momentum flux: S_ab = -(3 omega_loc / 2) Pi_neq_ab / rho
    (Chapman-Enskog), so gamma = sqrt(2 S:S) = A * omega_loc with
    A = 3 sqrt(2 Pi:Pi) / (2 rho).  The closure

        1 / omega_loc = 3 K (A omega_loc)^(n-1) + 1/2

    is solved per voxel by ``iterations`` Picard steps on tau seeded at the
    rate ``omega`` (voxel-local, unrolled, differentiable).  The map
    tau -> 3K (A / tau)^(n-1) + 1/2 contracts with rate |1-n| (1 - 1/(2 tau*)),
    so it converges geometrically for any power index in (0, 2).
    ``omega`` is the relaxation rate of the reference viscosity nu_ref; the
    caller picks K so that nu(gamma_ref) = nu_ref at the characteristic
    shear rate.  n < 1 is shear-thinning, n > 1 shear-thickening, n = 1
    reduces to BGK with nu = K exactly.  No reference counterpart
    (beyond-reference; reference's only strain-dependent model is the
    Smagorinsky LES, smagorinsky_les_bgk.py:44-66).
    """
    dt = f.dtype
    fneq = f - feq
    rho = jnp.sum(f, axis=0)
    pi = momentum_flux(fneq, cc, dt)
    if d == 3:
        diag, offdiag = (0, 3, 5), (1, 2, 4)
    else:
        diag, offdiag = (0, 2), (1,)
    pi_sq = jnp.sum(pi[diag, ...] ** 2, axis=0) + 2.0 * jnp.sum(pi[offdiag, ...] ** 2, axis=0)
    a = 1.5 * jnp.sqrt(2.0 * pi_sq) / rho
    k3 = 3.0 * dt.type(consistency)
    nm1 = dt.type(power_index - 1.0)
    eps = dt.type(1e-12)
    tau = jnp.broadcast_to(1.0 / jnp.asarray(omega, dt), a.shape)
    for _ in range(iterations):
        tau = k3 * (a / tau + eps) ** nm1 + 0.5
    om = jnp.clip(1.0 / tau, 0.05, 1.99)  # keep tau in a stable range
    return f - om[None, ...] * fneq


# ---------------------------------------------------------------------------
# TRT (two-relaxation-time, Ginzburg) -- no reference counterpart
# ---------------------------------------------------------------------------


def trt_omega_minus(omega, magic):
    """Odd-part relaxation rate from the even rate and the magic parameter.

    Lambda = (tau+ - 1/2)(tau- - 1/2); tau+ = 1/omega carries the shear
    viscosity (the momentum flux is even under c -> -c), so
    tau- = Lambda / (tau+ - 1/2) + 1/2.  Lambda = 1/4 puts walls exactly
    halfway for bounce-back ("magic" value); Lambda = 3/16 gives exact
    Poiseuille with halfway bounce-back walls.
    """
    tau_p_half = 1.0 / omega - 0.5
    return 1.0 / (magic / tau_p_half + 0.5)


def trt_collide(f, feq, omega, opposite_indices, magic=0.25):
    """Two-relaxation-time collision: split f and feq into parts even/odd
    under direction reversal and relax them at independent rates.

        f_l' = f_l - omega (f_l+ - feq_l+) - omega_minus (f_l- - feq_l-)

    where x_l+- = (x_l +- x_lbar)/2.  The even rate ``omega`` sets the shear
    viscosity exactly as in BGK; ``omega_minus`` follows from ``magic``
    (see trt_omega_minus).  With magic = (tau+ - 1/2)^2 the two rates
    coincide and TRT reduces to BGK exactly.
    """
    om_m = trt_omega_minus(omega, f.dtype.type(magic))
    f_opp = f[opposite_indices]
    feq_opp = feq[opposite_indices]
    f_even = 0.5 * (f + f_opp)
    f_odd = 0.5 * (f - f_opp)
    e_even = 0.5 * (feq + feq_opp)
    e_odd = 0.5 * (feq - feq_opp)
    return f - omega * (f_even - e_even) - om_m * (f_odd - e_odd)


# ---------------------------------------------------------------------------
# MRT (multiple-relaxation-time, d'Humieres) -- no reference counterpart
# ---------------------------------------------------------------------------


def _mrt_moment_groups(velocity_set):
    """Orthogonal moment basis for a stencil, grouped by physical content.

    Candidates are lattice monomials in physics order -- conserved (1, c_a),
    bulk (|c|^2), traceless second order (c_a^2 - c_b^2, c_a c_b), then all
    higher monomials c_x^i c_y^j c_z^k (i,j,k <= 2) by degree -- run through
    Gram-Schmidt, dropping candidates that are linearly dependent on earlier
    rows (e.g. c_x^2 alone, already spanned by 1, |c|^2 and the traceless
    pair).  This reproduces the d'Humieres/Lallemand-Luo construction up to
    row scaling, which cancels in the projectors.

    Returns a list of (group_name, orthogonal_row_vector) of length q.
    """
    c = velocity_set._c.astype(np.float64)
    d, q = c.shape
    cand = [("conserved", np.ones(q))]
    for a in range(d):
        cand.append(("conserved", c[a].copy()))
    r2 = (c**2).sum(axis=0)
    cand.append(("bulk", r2))
    for a in range(d - 1):
        cand.append(("shear", c[a] ** 2 - c[a + 1] ** 2))
    for a in range(d):
        for b in range(a + 1, d):
            cand.append(("shear", c[a] * c[b]))
    import itertools

    monos = sorted(
        (sum(es), es) for es in itertools.product(range(3), repeat=d) if sum(es) >= 2
    )
    for _, es in monos:
        v = np.ones(q)
        for a, e in enumerate(es):
            v = v * c[a] ** e
        cand.append(("ghost", v))

    kept = []
    for g, v in cand:
        w = v.copy()
        for _, u in kept:
            w = w - (w @ u) / (u @ u) * u
        if np.sqrt(w @ w) > 1e-8 * max(1.0, np.sqrt(v @ v)):
            kept.append((g, w))
        if len(kept) == q:
            break
    assert len(kept) == q, f"MRT basis incomplete: {len(kept)} of {q} rows"
    return kept


def mrt_projectors(velocity_set):
    """Symmetric projectors onto the conserved/shear/bulk/ghost moment
    subspaces.  Rows are orthogonal, so P_g = sum_i u_i u_i^T / (u_i.u_i)
    and P_conserved + P_shear + P_bulk + P_ghost = I exactly."""
    q = velocity_set.q
    P = {g: np.zeros((q, q)) for g in ("conserved", "shear", "bulk", "ghost")}
    for g, u in _mrt_moment_groups(velocity_set):
        P[g] += np.outer(u, u) / (u @ u)
    return P


def mrt_fixed_projectors(velocity_set, bulk_rate=None, ghost_rate=1.0):
    """Static (rate, projector) pairs for the groups NOT relaxing at omega.

    Groups whose rate is None relax at the traced ``omega`` -- since the
    projectors sum to I, the collision then rewrites as BGK plus one
    correction per fixed-rate group:

        f' = f - omega fneq + sum_g (omega - s_g) (P_g @ fneq)

    With bulk_rate=ghost_rate=None the list is empty and MRT IS BGK.
    """
    P = mrt_projectors(velocity_set)
    fixed = []
    for grp, rate in (("bulk", bulk_rate), ("ghost", ghost_rate)):
        if rate is not None:
            fixed.append((float(rate), P[grp]))
    return fixed


def mrt_collide(f, feq, omega, fixed_projectors):
    """Multiple-relaxation-time collision via static moment-space projectors
    (see mrt_fixed_projectors).  Contractions are unrolled adds
    (stencil_contract) to stay on the VPU at full compute precision."""
    fneq = f - feq
    out = f - omega * fneq
    for s, P in fixed_projectors:
        out = out + (omega - s) * stencil_contract(P, fneq)
    return out


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


class PowerLawBGK(Collision):
    """Generalized-Newtonian power-law fluid: nu = K gamma^(n-1) with the
    local shear rate from Pi_neq (see power_law_collide).  ``power_index``
    n < 1 shear-thinning (e.g. blood ~0.7), n > 1 shear-thickening; n = 1
    is Newtonian with nu = consistency.  No reference counterpart
    (beyond-reference)."""

    def __init__(
        self,
        velocity_set=None,
        precision_policy=None,
        compute_backend=None,
        consistency=None,
        power_index=1.0,
        iterations=5,
    ):
        super().__init__(velocity_set, precision_policy, compute_backend)
        if consistency is None:
            raise ValueError("PowerLawBGK needs `consistency` (K, lattice units): nu = K gamma^(n-1)")
        self.consistency = float(consistency)
        self.power_index = float(power_index)
        self.iterations = int(iterations)

    def __call__(self, f, feq, omega):
        return power_law_collide(
            f, feq, self.compute_dtype(omega), self.velocity_set._cc, self.velocity_set.d,
            self.consistency, self.power_index, self.iterations,
        )


class TRT(Collision):
    """Two-relaxation-time collision (Ginzburg).  ``magic`` is the Lambda
    parameter tying the odd rate to the even (viscosity) rate; 1/4 is the
    stability/wall-location optimum, 3/16 gives exact Poiseuille with
    halfway bounce-back.  No reference counterpart (beyond-reference)."""

    def __init__(self, velocity_set=None, precision_policy=None, compute_backend=None, magic=0.25):
        super().__init__(velocity_set, precision_policy, compute_backend)
        self.magic = float(magic)

    def __call__(self, f, feq, omega):
        return trt_collide(
            f, feq, self.compute_dtype(omega), self.velocity_set._opp_indices, self.magic
        )


class MRT(Collision):
    """Multiple-relaxation-time collision (d'Humieres) on the orthogonal
    moment basis of the stencil.  Shear moments relax at ``omega`` (same
    viscosity as BGK); ``bulk_rate``/``ghost_rate`` relax the trace and the
    higher (ghost) moments -- None means "use omega", so with both None MRT
    equals BGK exactly.  ghost_rate defaults to 1.0 (the regularized limit:
    non-hydrodynamic content is projected out every step).  No reference
    counterpart (beyond-reference)."""

    def __init__(
        self,
        velocity_set=None,
        precision_policy=None,
        compute_backend=None,
        bulk_rate=None,
        ghost_rate=1.0,
    ):
        super().__init__(velocity_set, precision_policy, compute_backend)
        self.bulk_rate = bulk_rate
        self.ghost_rate = ghost_rate
        self.fixed_projectors = mrt_fixed_projectors(self.velocity_set, bulk_rate, ghost_rate)

    def __call__(self, f, feq, omega):
        return mrt_collide(f, feq, self.compute_dtype(omega), self.fixed_projectors)


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
