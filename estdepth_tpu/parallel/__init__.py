from estdepth_tpu.parallel.mesh import create_mesh, shard_batch
from estdepth_tpu.parallel.spatial import make_spatial_window_fn

__all__ = ["create_mesh", "shard_batch", "make_spatial_window_fn"]
