from xlb_tpu.helper.nse_fields import create_nse_fields
from xlb_tpu.helper.initializers import initialize_eq
from xlb_tpu.helper.check_boundary_overlaps import check_bc_overlaps

__all__ = ["create_nse_fields", "initialize_eq", "check_bc_overlaps"]
