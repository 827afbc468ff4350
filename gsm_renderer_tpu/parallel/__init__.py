from .multichip import build_sharded_depth_first, shard_gaussian_input  # noqa: F401
