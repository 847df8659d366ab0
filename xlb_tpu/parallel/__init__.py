from xlb_tpu.parallel.distribute import distribute, distribute_operator
from xlb_tpu.parallel.multihost import (
    hybrid_mesh_devices,
    init_distributed,
    is_multiprocess,
    process_local_fields,
)

__all__ = [
    "distribute",
    "distribute_operator",
    "init_distributed",
    "hybrid_mesh_devices",
    "is_multiprocess",
    "process_local_fields",
]
