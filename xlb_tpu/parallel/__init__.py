from xlb_tpu.parallel.distribute import distribute, distribute_operator

__all__ = ["distribute", "distribute_operator"]
