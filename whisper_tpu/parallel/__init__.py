from whisper_tpu.parallel.mesh import make_mesh
from whisper_tpu.parallel.sharding import param_shardings, shard_params

__all__ = ["make_mesh", "param_shardings", "shard_params"]
