"""Per-token (per-column) int8 quantization for the decode KV caches.

Decode is HBM-bandwidth-bound (BASELINE.md; the cross-KV stream alone is
~2 GB per decode step on large-v2/B=8), so halving KV bytes nearly halves
step time. Scales are PER COLUMN (one f32 per token per layer per lane):

  value[hd, s] = int8[hd, s] * scale[s]

which folds into the decode-attention kernel for free —
  scores[h, s] = (sum_hd q*K8) * k_scale[s]      (one [H,S] multiply)
  out[hd]      = sum_s V8 * (p[s] * v_scale[s])  (one [H,S] multiply)
— unlike per-channel scales, which a cache that grows one column at a time
cannot maintain (the row maximum changes as tokens append).

The reference stores KV as FP16 (KeyValueBuffers.h:7-53); int8+scale keeps
~the same effective precision for whisper's post-layernorm K/V ranges
(max relative quantization step 1/127 per column).
"""

from __future__ import annotations

import jax.numpy as jnp


def quantize_cols(x, axis: int):
    """Symmetric int8 quantization along all dims EXCEPT ``axis``... i.e.
    one scale per slice orthogonal to ``axis``.

    x [..., HD, S] with axis=-2 -> (int8 x, f32 scale [..., 1, S]).
    x [B, S, HD] with axis=-1   -> (int8 x, f32 scale [B, S, 1]).
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def dequantize(q, scale, dtype=jnp.bfloat16):
    """int8 + broadcastable scale -> dtype."""
    return (q.astype(jnp.float32) * scale).astype(dtype)
