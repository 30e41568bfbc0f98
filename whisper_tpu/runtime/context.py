"""WhisperContext analogue: owns the jitted encode/decode entry points.

The reference WhisperContext (Whisper/Whisper/WhisperContext.h:96-127) owns
GPU arenas + KV buffers and exposes encode()/decode(). Here the state is a
set of jit-compiled executables (XLA owns memory) keyed by static shapes:

  encode_window : mel [B, n_mels, 2*T] -> cross-attention K/V for all layers
  run_window    : padded prompt + cross KV -> WindowResult (full on-device
                  token loop, one host sync per window)

Shapes are static per (batch, audio_ctx) pair; recompiles are cached by jit.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from whisper_tpu.hparams import ModelDims
from whisper_tpu.model.decoder import init_self_kv
from whisper_tpu.model.encoder import encode, precompute_cross_kv
from whisper_tpu.runtime.decode import WindowResult, decode_window
from whisper_tpu.runtime.sampler import SpecialIds


class WhisperRuntime:
    """Compiled compute state for one model (shareable across Contexts)."""

    def __init__(
        self,
        params: Any,
        dims: ModelDims,
        special_ids: SpecialIds,
        compute_dtype=jnp.bfloat16,
        kernels=None,
    ):
        from whisper_tpu.config import KernelConfig

        self.params = params
        self.dims = dims
        self.ids = special_ids
        self.compute_dtype = compute_dtype
        self.kernels = kernels if kernels is not None else KernelConfig.auto()
        kcfg = self.kernels

        @functools.partial(jax.jit)
        def _encode_window(params, mel):
            feats = encode(params, dims, mel, compute_dtype=compute_dtype, kernels=kcfg)
            cross = precompute_cross_kv(
                params, dims, feats, compute_dtype=compute_dtype,
                quant=kcfg.kv_int8,
            )
            return feats, cross

        @functools.partial(
            jax.jit,
            static_argnames=("max_tokens", "single_segment", "force_steps"),
        )
        def _run_window(
            params, prompt, prompt_len, cross_kv, seek, seek_end,
            max_tokens, single_segment, force_steps,
        ) -> WindowResult:
            kv = init_self_kv(
                dims, prompt.shape[0], dtype=compute_dtype, quant=kcfg.kv_int8)
            return decode_window(
                params, dims, special_ids, prompt, prompt_len, kv, cross_kv,
                seek, seek_end, max_tokens=max_tokens,
                single_segment=single_segment, compute_dtype=compute_dtype,
                force_steps=force_steps, kernels=kcfg,
            )

        self._encode_window = _encode_window
        self._run_window = _run_window

    # Prompt capacity: [_PREV_] + n_text_ctx/2 past tokens + SOT + lang + task
    # (reference prompt assembly, ContextImpl.cpp:562-576).
    @property
    def prompt_capacity(self) -> int:
        return self.dims.n_text_ctx // 2 + 4

    @property
    def n_max_steps(self) -> int:
        return self.dims.n_text_ctx // 2 - 4

    def encode_window(self, mel: jax.Array):
        """mel [B, n_mels, 2*T] -> (audio_features, cross_kv)."""
        return self._encode_window(self.params, mel)

    def run_window(
        self,
        prompt: jax.Array,
        prompt_len: jax.Array,
        cross_kv,
        seek: jax.Array,
        seek_end: jax.Array,
        max_tokens: int = 0,
        single_segment: bool = False,
        force_steps: int = 0,
    ) -> WindowResult:
        return self._run_window(
            self.params, prompt, prompt_len, cross_kv, seek, seek_end,
            max_tokens, single_segment, force_steps,
        )
