from xlb_tpu.models.stepper import Stepper
from xlb_tpu.models.nse import IncompressibleNavierStokesStepper
from xlb_tpu.models.ade import (
    AdvectionDiffusionStepper,
    ThermalNSEStepper,
    omega_from_diffusivity,
    diffusivity_from_omega,
)

__all__ = [
    "Stepper",
    "IncompressibleNavierStokesStepper",
    "AdvectionDiffusionStepper",
    "ThermalNSEStepper",
    "omega_from_diffusivity",
    "diffusivity_from_omega",
]
