from xlb_tpu.utils.io import save_image, save_fields_vtk, save_BCs_vtk, write_vti
from xlb_tpu.utils.units import UnitConvertor, omega_from_reynolds, viscosity_from_omega

__all__ = [
    "save_image",
    "save_fields_vtk",
    "save_BCs_vtk",
    "write_vti",
    "UnitConvertor",
    "omega_from_reynolds",
    "viscosity_from_omega",
]
