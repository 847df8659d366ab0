from xlb_tpu.utils.io import save_image, save_fields_vtk, save_BCs_vtk, write_vti
from xlb_tpu.utils.units import UnitConvertor, omega_from_reynolds, viscosity_from_omega
from xlb_tpu.utils.usd import save_usd_mesh, save_usd_points, save_usd_vorticity, save_usd_q_criterion
from xlb_tpu.utils.profiling import ScopedTimer, trace, capture_trace, sync, mlups
from xlb_tpu.utils.fields import downsample_field, rotate_geometry, axangle2mat, colorize_scalars

__all__ = [
    "save_image",
    "save_fields_vtk",
    "save_BCs_vtk",
    "write_vti",
    "UnitConvertor",
    "omega_from_reynolds",
    "viscosity_from_omega",
    "save_usd_mesh",
    "save_usd_points",
    "save_usd_vorticity",
    "save_usd_q_criterion",
    "ScopedTimer",
    "trace",
    "capture_trace",
    "sync",
    "mlups",
    "downsample_field",
    "rotate_geometry",
    "axangle2mat",
    "colorize_scalars",
]
