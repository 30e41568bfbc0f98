"""Audio encoder: conv stem + GELU + positional add, N pre-LN transformer
blocks under ``lax.scan``, final layernorm, and cross-attention K/V
precompute.

Behavioral spec from the reference:
  - conv stem: conv1d(k=3,s=1,p=1) -> GELU -> conv1d(k=3,s=2,p=1) -> GELU ->
    + positional embedding (WhisperContext.cpp:138-156 convolutionAndGelu)
  - block: x += attn(ln(x)); x += mlp(ln(x)) with GELU MLP
    (WhisperContext.cpp:158-289 encodeLayer)
  - after ln_post, cross-attention K (pre-scaled by (d/h)^-0.25) and V are
    computed once per window for ALL decoder layers
    (WhisperContext.cpp:344-389) — here they live as a stacked
    [L, B, S, H, Dh] pair that the decoder treats as read-only.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from whisper_tpu.hparams import ModelDims
from whisper_tpu.model.layers import (
    attention,
    dense,
    gelu,
    layer_norm,
    merge_heads,
    qkv_proj,
    split_heads,
)


def _unfold3(x, stride: int):
    """k=3, pad=1 temporal unfold: [B, T, C] -> [B, T//stride, 3C]
    (tap-major concat matching the [3, in, out] kernel reshape)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    t = x.shape[1]
    t_out = t // stride
    taps = [xp[:, k : k + t : stride][:, :t_out] for k in range(3)]
    return jnp.concatenate(taps, axis=-1)


def _conv_stem(enc, mel, compute_dtype):
    """mel [B, n_mels, 2*T] -> [B, T, d].

    The k=3 convs are expressed as unfold+matmul ([B,T,3C] @ [3C,d]) instead
    of lax.conv: XLA's conv lowering runs ~30x slower than the equivalent
    GEMM at whisper's tiny channel counts (measured on v5e), and one big
    matmul is exactly what the MXU wants — the same insight as the
    reference's convolutionPrep im2col shaders (ComputeShaders/
    convolutionPrep1.hlsl), but with the product fused into a single GEMM.
    """
    x = mel.astype(compute_dtype).transpose(0, 2, 1)  # [B, 2T, n_mels]
    w1 = enc["conv1_w"].reshape(-1, enc["conv1_w"].shape[-1])  # [3*in, d]
    y = dense(_unfold3(x, 1), w1.astype(compute_dtype), enc["conv1_b"])
    x = gelu(y).astype(compute_dtype)                  # [B, 2T, d]
    w2 = enc["conv2_w"].reshape(-1, enc["conv2_w"].shape[-1])
    y = dense(_unfold3(x, 2), w2.astype(compute_dtype), enc["conv2_b"])
    return gelu(y)                                     # f32 [B, T, d]


def _encoder_block(x, blk, n_head, compute_dtype, kernels=None):
    """One pre-LN encoder block. x: [B, T, d] compute_dtype."""
    h = layer_norm(x, blk["attn_ln_w"], blk["attn_ln_b"]).astype(compute_dtype)
    q, k, v = qkv_proj(h, blk["qkv_w"], blk["qkv_b"], n_head)
    q = q.astype(compute_dtype)
    k = k.astype(compute_dtype)
    v = v.astype(compute_dtype)
    if kernels is not None and kernels.flash_attention:
        from whisper_tpu.kernels.attention import flash_attention

        att = merge_heads(flash_attention(q, k, v, interpret=kernels.interpret))
        att = att.astype(compute_dtype)
    else:
        att = merge_heads(attention(q, k, v, compute_dtype=compute_dtype)).astype(compute_dtype)
    x = x + dense(att, blk["o_w"], blk["o_b"]).astype(compute_dtype)

    h = layer_norm(x, blk["mlp_ln_w"], blk["mlp_ln_b"]).astype(compute_dtype)
    h = gelu(dense(h, blk["fc1_w"], blk["fc1_b"])).astype(compute_dtype)
    x = x + dense(h, blk["fc2_w"], blk["fc2_b"]).astype(compute_dtype)
    return x


def encode(
    params,
    dims: ModelDims,
    mel: jax.Array,          # [B, n_mels, 2*audio_ctx]
    compute_dtype=jnp.bfloat16,
    kernels=None,
) -> jax.Array:
    """Full encoder forward -> audio features [B, audio_ctx, d] (f32).

    ``audio_ctx`` is implied by the mel window length (the sFullParams
    audio_ctx override shrinks the window, reference ContextImpl.cpp:24,489).
    ``kernels``: optional KernelConfig selecting Pallas fused attention.
    """
    enc = params["enc"]
    x = _conv_stem(enc, mel, compute_dtype)            # [B, T, d] f32
    t = x.shape[1]
    x = (x + enc["pos"][:t]).astype(compute_dtype)

    def body(carry, blk):
        return _encoder_block(carry, blk, dims.n_audio_head, compute_dtype, kernels), None

    x, _ = jax.lax.scan(body, x, enc["blocks"])
    return layer_norm(x, enc["ln_post_w"], enc["ln_post_b"])  # f32


class CrossKV(NamedTuple):
    """Per-window cross-attention K/V for all decoder layers (the kvCross
    analogue, KeyValueBuffers.h:7-53). Indexable like the legacy (k, v)
    tuple; k_s/v_s are per-column int8 scales [L, B, 1, T] or None."""

    k: jax.Array                  # [L, B, HD, T]
    v: jax.Array
    k_s: jax.Array | None = None
    v_s: jax.Array | None = None


def precompute_cross_kv(
    params,
    dims: ModelDims,
    audio_features: jax.Array,   # [B, T, d] f32 (encode output)
    compute_dtype=jnp.bfloat16,
    quant: bool = False,
) -> CrossKV:
    """Cross-attention K/V for every decoder layer, K pre-scaled.

    Returns CrossKV with k/v [L, B, H*Dh, T] in compute_dtype (int8 +
    per-column scales when ``quant`` — decode reads this array 100+ times
    per window, so halving its bytes halves the dominant decode stream),
    stored TRANSPOSED (features-major) so the per-token decode attention
    streams them as [Dh, S] tiles (kernels/decode_attention.py)."""
    xf = audio_features.astype(compute_dtype)

    def body(_, blk):
        # K pre-scale is folded into xk_w at load (params.fuse_qkv docstring)
        k = dense(xf, blk["xk_w"]).astype(compute_dtype)          # [B, T, HD]
        v = dense(xf, blk["xv_w"], blk["xv_b"]).astype(compute_dtype)
        k = k.transpose(0, 2, 1)                                  # [B, HD, T]
        v = v.transpose(0, 2, 1)
        if quant:
            from whisper_tpu.kernels.quant import quantize_cols

            k, ks = quantize_cols(k, axis=-2)
            v, vs = quantize_cols(v, axis=-2)
            return None, (k, v, ks, vs)
        return None, (k, v)

    _, out = jax.lax.scan(body, None, params["dec"]["blocks"])
    return CrossKV(*out)
