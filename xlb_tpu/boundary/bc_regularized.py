"""Regularized velocity/pressure boundary condition (Latt & Chopard 2008).

Parity with reference bc_regularized.py:30-135: Zou-He closure +
regularization of all boundary populations from the non-equilibrium
momentum flux:

    f = feq + (9/2) w_l (Q_l : Pi_neq)
"""

import jax.numpy as jnp

from xlb_tpu.boundary.bc_zouhe import ZouHeBC
from xlb_tpu.ops.macroscopic import momentum_flux
from xlb_tpu.ops.stencil_math import stencil_contract


class RegularizedBC(ZouHeBC):
    def regularize_fpop(self, fpop, feq):
        vs = self.velocity_set
        fneq = fpop - feq
        pi_neq = momentum_flux(fneq, vs._cc, fpop.dtype)
        qipi = stencil_contract(vs._qi, pi_neq)
        import numpy as np

        w = vs._w.astype(np.dtype(fpop.dtype)).reshape((-1,) + (1,) * (fpop.ndim - 1))
        return feq + 4.5 * w * qipi

    def __call__(self, f_pre, f_post, bc_mask, missing_mask):
        boundary = self.boundary_map(bc_mask)
        feq = self.calculate_equilibrium(f_post, missing_mask)
        f_bd = self.bounceback_nonequilibrium(f_post, feq, missing_mask)
        f_bd = self.regularize_fpop(f_bd, feq)
        return jnp.where(boundary, f_bd, f_post)
