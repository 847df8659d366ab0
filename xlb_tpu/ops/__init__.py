from xlb_tpu.ops.stream import Stream
from xlb_tpu.ops.equilibrium import Equilibrium, QuadraticEquilibrium
from xlb_tpu.ops.macroscopic import ZeroMoment, FirstMoment, SecondMoment, Macroscopic
from xlb_tpu.ops.collision import Collision, BGK, KBC, SmagorinskyLESBGK, TRT, MRT, PowerLawBGK, ForcedCollision
from xlb_tpu.ops.force import ExactDifference, MomentumTransfer, MultiresMomentumTransfer
from xlb_tpu.ops.precision_caster import PrecisionCaster

__all__ = [
    "Stream",
    "Equilibrium",
    "QuadraticEquilibrium",
    "ZeroMoment",
    "FirstMoment",
    "SecondMoment",
    "Macroscopic",
    "Collision",
    "BGK",
    "KBC",
    "SmagorinskyLESBGK",
    "TRT",
    "MRT",
    "PowerLawBGK",
    "ForcedCollision",
    "ExactDifference",
    "MomentumTransfer",
    "MultiresMomentumTransfer",
    "PrecisionCaster",
]
