from umgen_tpu.parallel.mesh import make_mesh, param_sharding, data_sharding

__all__ = ["make_mesh", "param_sharding", "data_sharding"]
