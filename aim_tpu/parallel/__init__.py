from aim_tpu.parallel.mesh import make_mesh, pair_sharding  # noqa: F401
