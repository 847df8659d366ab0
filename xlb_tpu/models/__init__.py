from xlb_tpu.models.stepper import Stepper
from xlb_tpu.models.nse import IncompressibleNavierStokesStepper
from xlb_tpu.models.ade import (
    AdvectionDiffusionStepper,
    ThermalNSEStepper,
    omega_from_diffusivity,
    diffusivity_from_omega,
)
from xlb_tpu.models.multiphase import ShanChenMultiphaseStepper

__all__ = [
    "Stepper",
    "IncompressibleNavierStokesStepper",
    "AdvectionDiffusionStepper",
    "ThermalNSEStepper",
    "ShanChenMultiphaseStepper",
    "omega_from_diffusivity",
    "diffusivity_from_omega",
]
