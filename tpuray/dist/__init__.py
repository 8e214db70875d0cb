from tpuray.dist.sharding import make_mesh, render_tiled
from tpuray.dist.frame import render_frame_sharded, shard_state

__all__ = ["make_mesh", "render_tiled", "render_frame_sharded", "shard_state"]
