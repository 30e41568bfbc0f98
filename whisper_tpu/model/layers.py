"""Shared transformer building blocks (pure jnp reference path).

These are the jnp "reference backend" implementations — the numerics ground
truth the Pallas kernels are diffed against, playing the role of the
reference's GGML CPU backend (SURVEY.md §2.8). Shapes use B=batch, T=query
length, S=key length, H=heads, Dh=head dim, d=model dim.

All matmuls accumulate in f32 (``preferred_element_type``), layernorm runs in
f32; activations travel in the policy compute dtype (bf16 on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x: jax.Array, w: jax.Array, b: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm with GGML's eps=1e-5 (reference MlContext norm shader,
    MlContext.cpp:333-356). Computes in f32, returns f32."""
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * w + b


def dense(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    s: jax.Array | None = None,
) -> jax.Array:
    """x @ w (+ b), f32 accumulation, result in f32.

    ``s`` dequantizes int8 weights as a matmul epilogue: one f32 scale per
    output column (params.quantize_weight), applied BEFORE the bias. XLA
    fuses the int8->bf16 operand convert into the dot's weight stream, so
    HBM reads stay at 1 byte/weight."""
    if s is not None:
        w = w.astype(x.dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if s is not None:
        y = y * s
    if b is not None:
        y = y + b
    return y


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU in f32 — the reference's FP16 LUT approximates the
    same function (LookupTables, SURVEY.md §2.3); TPU computes it natively."""
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False)


def split_heads(x: jax.Array, n_head: int) -> jax.Array:
    """[B, T, d] -> [B, T, H, Dh]"""
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head)


def merge_heads(x: jax.Array) -> jax.Array:
    """[B, T, H, Dh] -> [B, T, d]"""
    b, t, h, dh = x.shape
    return x.reshape(b, t, h * dh)


def qk_scale(head_dim: int) -> float:
    """Whisper's split scaling: both q and k are multiplied by
    (d/h)^-0.25 (reference WhisperContext.cpp encodeLayer + pre-scaled
    cross-K at :360-388). NOTE: the load path folds this into the QKV /
    cross projections (params.fuse_qkv); only code operating on raw
    unfolded weights needs it."""
    return float(head_dim) ** -0.25


def qkv_proj(h: jax.Array, qkv_w: jax.Array, qkv_b: jax.Array, n_head: int,
             qkv_s: jax.Array | None = None):
    """Fused head-major QKV projection: h [B,S,d] -> (q, k, v) each
    [B,S,H,Dh]. Column layout per params.fuse_qkv; scales pre-folded."""
    y = dense(h, qkv_w, qkv_b, s=qkv_s)              # [B, S, 3d] f32
    b, s, _ = y.shape
    y = y.reshape(b, s, n_head, 3, -1)
    return y[:, :, :, 0], y[:, :, :, 1], y[:, :, :, 2]


def attention(
    q: jax.Array,  # [B, T, H, Dh], pre-scaled
    k: jax.Array,  # [B, S, H, Dh], pre-scaled
    v: jax.Array,  # [B, S, H, Dh]
    mask: jax.Array | None = None,  # broadcastable to [B, H, T, S], True=keep
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Naive attention: scores/softmax in f32, weights cast for the PV matmul."""
    scores = jnp.einsum(
        "bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32
    )
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.float32(-1e30))
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhts,bshd->bthd",
        probs.astype(compute_dtype),
        v.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return out
