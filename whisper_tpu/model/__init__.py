from whisper_tpu.model.params import DtypePolicy, load_params, params_from_checkpoint
from whisper_tpu.model.encoder import encode, precompute_cross_kv
from whisper_tpu.model.decoder import decode_step, init_self_kv

__all__ = [
    "DtypePolicy",
    "load_params",
    "params_from_checkpoint",
    "encode",
    "precompute_cross_kv",
    "decode_step",
    "init_self_kv",
]
