"""Model object + factory (iModel / loadModel analogue,
Whisper/API/iContext.h:43-57, modelFactory.cpp:5-20).

Owns the checkpoint-derived state: dims, vocabulary, mel front-end, and the
compiled runtime. ``clone()`` is free here — jax arrays are immutable and the
compiled executables are shared — whereas the reference needed D3D
shared-resource plumbing (ModelImpl.cpp:40-60).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from whisper_tpu.api.context import Context
from whisper_tpu.features.mel import LogMelSpectrogram
from whisper_tpu.ggml import load_checkpoint
from whisper_tpu.hparams import ModelDims
from whisper_tpu.model.params import DtypePolicy, params_from_checkpoint
from whisper_tpu.runtime.context import WhisperRuntime
from whisper_tpu.runtime.sampler import SpecialIds
from whisper_tpu.vocab import SpecialTokens, Vocabulary


class Model:
    def __init__(
        self,
        path: str,
        policy: Optional[DtypePolicy] = None,
        mel_mode: str = "openai",
        mesh=None,
        progress=None,
    ):
        import time

        t0 = time.perf_counter()
        cp = load_checkpoint(path, progress=progress)
        self.dims: ModelDims = cp.dims
        self.vocab = Vocabulary(cp.vocab_words, cp.dims.n_vocab)
        policy = policy or DtypePolicy()
        params = params_from_checkpoint(cp, policy)
        self.load_time_cpu_s = time.perf_counter() - t0

        if mesh is not None:
            from whisper_tpu.parallel.sharding import shard_params

            params = shard_params(params, mesh)
        self.mesh = mesh

        self.mel = LogMelSpectrogram(cp.filters.data, mode=mel_mode)
        self.runtime = WhisperRuntime(
            params,
            cp.dims,
            SpecialIds.from_vocab(self.vocab),
            compute_dtype=policy.compute_dtype,
        )
        self.load_time_total_s = time.perf_counter() - t0

    # ------------------------------------------------------------------

    def create_context(self) -> Context:
        return Context(self)

    def tokenize(self, text: str) -> list[int]:
        return self.vocab.tokenize(text)

    @property
    def is_multilingual(self) -> bool:
        return self.vocab.multilingual

    @property
    def special_tokens(self) -> SpecialTokens:
        return self.vocab.special_tokens

    def string_from_token(self, token_id: int) -> Optional[str]:
        return self.vocab.string(token_id)

    def clone(self) -> "Model":
        """Shared-weights clone (reference needed D3D shared handles;
        immutable jax arrays make this a no-op alias)."""
        return self


def load_model(
    path: str,
    policy: Optional[DtypePolicy] = None,
    mel_mode: str = "openai",
    mesh=None,
    progress=None,
) -> Model:
    return Model(path, policy=policy, mel_mode=mel_mode, mesh=mesh, progress=progress)
