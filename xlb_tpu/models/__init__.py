from xlb_tpu.models.stepper import Stepper
from xlb_tpu.models.nse import IncompressibleNavierStokesStepper

__all__ = ["Stepper", "IncompressibleNavierStokesStepper"]
