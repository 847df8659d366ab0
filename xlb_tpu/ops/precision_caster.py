"""Precision-casting operator (reference xlb/operator/precision_caster/
precision_caster.py:16-97): converts a field between two precision policies'
storage dtypes."""

from xlb_tpu.operator import Operator
from xlb_tpu.precision_policy import PrecisionPolicy


class PrecisionCaster(Operator):
    def __init__(self, target_policy: PrecisionPolicy, velocity_set=None, precision_policy=None, compute_backend=None):
        super().__init__(velocity_set, precision_policy, compute_backend)
        self.target_policy = target_policy

    def __call__(self, f):
        return f.astype(self.target_policy.store_dtype)
