"""Physics-type enum (parity with reference xlb/physics_type.py:6-8)."""

from enum import Enum, auto


class PhysicsType(Enum):
    NSE = auto()  # incompressible Navier-Stokes
    ADE = auto()  # advection-diffusion (implemented in models/ade.py; placeholder in the reference)
