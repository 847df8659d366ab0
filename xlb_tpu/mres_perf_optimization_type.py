"""Multires kernel-fusion strategy enum + CLI helper.

API parity with reference xlb/mres_perf_optimization_type.py:12-83.  The
strategies select how much of the per-level work runs through the fused
Pallas collide kernel (kernels/collide_only.py, one HBM round trip instead
of ~q XLA passes for the moment-coupled collision):

- NAIVE_COLLIDE_STREAM: pure jnp tier on every level.
- FUSION_AT_FINEST: fused collide at the finest level (where most of the
  sub-steps happen).
- FUSION_AT_FINEST_SFV / _SFV_ALL: fused collide at every level.  The
  reference's SFV fast paths skip sparse-voxel bookkeeping per cell class
  (nse_multires_stepper.py:626-1110); the dense design has no such
  bookkeeping, so both map to all-level fusion.

Levels whose BC list needs non-elementwise collision-time work
(aux-staging outflows) fall back to the jnp tier automatically.
"""

import argparse
from enum import Enum


class MresPerfOptimizationType(Enum):
    NAIVE_COLLIDE_STREAM = "naive_collide_stream"
    FUSION_AT_FINEST = "fusion_at_finest"
    FUSION_AT_FINEST_SFV = "fusion_at_finest_sfv"
    FUSION_AT_FINEST_SFV_ALL = "fusion_at_finest_sfv_all"

    @classmethod
    def from_string(cls, name: str) -> "MresPerfOptimizationType":
        try:
            return cls(name.lower())
        except ValueError:
            valid = ", ".join(m.value for m in cls)
            raise ValueError(f"unknown multires optimization {name!r}; choose from: {valid}") from None

    @staticmethod
    def build_arg_parser(parser: argparse.ArgumentParser = None) -> argparse.ArgumentParser:
        parser = parser or argparse.ArgumentParser()
        parser.add_argument(
            "--mres-perf-optimization",
            type=str,
            default=MresPerfOptimizationType.FUSION_AT_FINEST.value,
            choices=[m.value for m in MresPerfOptimizationType],
            help="multires kernel-fusion strategy (dense TPU levels fuse automatically; kept for CLI parity)",
        )
        return parser
