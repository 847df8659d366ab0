from xlb_tpu.grid.grid import Grid, grid_factory

__all__ = ["Grid", "grid_factory"]
