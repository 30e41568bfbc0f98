"""whisper_tpu — a TPU-native Whisper inference framework (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of Const-me/Whisper
(D3D11 compute-shader Whisper engine) for TPU hardware:

  - compute path: JAX/XLA with Pallas kernels for the hot ops
    (attention, conv stem, fused layernorm), bf16 weights, f32 accumulation
  - runtime: jit-compiled on-device decode loop (``lax.while_loop`` with
    on-device sampling + whisper timestamp rules) instead of the reference's
    per-token GPU->CPU sync (reference: Whisper/Whisper/WhisperContext.cpp:634-638)
  - scaling: ``jax.sharding.Mesh`` + NamedSharding (data / model axes)
    instead of single-device dispatch

Public API shape mirrors the reference COM surface
(Whisper/API/iContext.h:22-68): ``load_model`` -> ``Model`` ->
``Context`` -> ``TranscribeResult``.
"""

__version__ = "0.1.0"

from whisper_tpu.hparams import ModelDims
from whisper_tpu.api.params import (
    FullParams,
    Flags,
    SamplingStrategy,
    full_default_params,
)
from whisper_tpu.api.result import Segment, Token, TranscribeResult
from whisper_tpu.languages import (
    LANGUAGES,
    find_language_id,
    language_name,
    supported_languages,
)


def __getattr__(name):
    # Model/load_model pull in jax + the full runtime; import lazily so that
    # light-weight uses (tokenizer, ggml tools) stay fast.
    if name in ("Model", "load_model"):
        from whisper_tpu.api import model as _model

        return getattr(_model, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

__all__ = [
    "ModelDims",
    "FullParams",
    "Flags",
    "SamplingStrategy",
    "full_default_params",
    "Model",
    "load_model",
    "Segment",
    "Token",
    "TranscribeResult",
    "LANGUAGES",
    "find_language_id",
    "language_name",
    "supported_languages",
]
