"""Text decoder with preallocated self-attention KV cache.

Behavioral spec from the reference decodeLayer/decode
(WhisperContext.cpp:407-576,578-639):
  - embeddings: token_embedding[ids] + positional_embedding[n_past..]
    (the addRows shader, MlContext.cpp:588-618)
  - masked self-attention writes this step's K/V into the per-layer cache at
    offset n_past, then attends over entries <= query position
  - cross-attention reads the precomputed, pre-scaled kvCross
  - logits = ln(x) @ token_embedding^T

TPU-native differences: the cache is a single stacked [L, B, C, H, Dh] pair
updated via per-lane ``dynamic_update_slice`` (vmapped over batch) inside the
layer scan; ``n_past`` is a [B] vector so data-parallel lanes and beams can
sit at different depths; shapes are static (C = n_text_ctx); and the whole
step is jit-compatible so the token loop lives on device (no per-token host
sync — the reference's central bottleneck, WhisperContext.cpp:634-639).

Padded prompts: right-pad to a fixed length and pass the true length via
``n_past_after``/``logits_row``. Pad rows only write cache slots at
positions >= the true length, which later real tokens overwrite before any
real query can attend them (mask is key_pos <= query_pos).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from whisper_tpu.hparams import ModelDims
from whisper_tpu.model.layers import dense, gelu, layer_norm, qkv_proj


class SelfKV(NamedTuple):
    """Preallocated self-attention cache (KeyValueBuffers.h:7-53 analogue).

    TRANSPOSED layout [L, B, H*Dh, C] (features-major, like the cross KV):
    appends write a column, and single-token attention streams [Dh, C]
    tiles through the decode-attention kernel."""

    k: jax.Array  # [L, B, HD, C]
    v: jax.Array  # [L, B, HD, C]


def init_self_kv(
    dims: ModelDims, batch: int, dtype=jnp.bfloat16, cache_len: int | None = None
) -> SelfKV:
    shape = (
        dims.n_text_layer,
        batch,
        dims.n_text_state,
        cache_len or dims.n_text_ctx,
    )
    return SelfKV(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def _cache_append(cache: jax.Array, new: jax.Array, n_past: jax.Array) -> jax.Array:
    """Per-lane KV column append: cache [B,HD,C], new [B,S,HD], n_past [B]."""
    new_t = new.transpose(0, 2, 1)  # [B, HD, S]

    def one(c, n, p):
        return jax.lax.dynamic_update_slice(c, n, (0, p))

    return jax.vmap(one)(cache, new_t, n_past)


def _cross_attention(h, blk, xk, xv, n_head, compute_dtype, kernels):
    """Cross-attention over transposed kvCross [B, HD, Sx].
    h: normalized input [B, S, d]. Returns [B, S, d] f32 context."""
    b, s, d = h.shape
    q = dense(h, blk["xq_w"], blk["xq_b"]).astype(compute_dtype)  # [B, S, HD]
    use_kernel = (
        s == 1 and kernels is not None and kernels.flash_attention
    )
    if use_kernel:
        from whisper_tpu.kernels.decode_attention import decode_attention_hd

        out = decode_attention_hd(
            q.transpose(0, 2, 1), xk, xv, n_head, interpret=kernels.interpret
        )                                                      # [B, HD, 1]
        return out.transpose(0, 2, 1)                          # [B, 1, HD] f32
    # einsum path (prompt ingest / reference numerics)
    dh = d // n_head
    sx = xk.shape[-1]
    q4 = q.reshape(b, s, n_head, dh)
    k4 = xk.reshape(b, n_head, dh, sx)
    v4 = xv.reshape(b, n_head, dh, sx)
    scores = jnp.einsum("bthd,bhds->bhts", q4, k4, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(scores, axis=-1).astype(compute_dtype)
    out = jnp.einsum("bhts,bhds->bthd", p, v4, preferred_element_type=jnp.float32)
    return out.reshape(b, s, d)


def _self_attention(q, k_cache, v_cache, n_past, n_head, compute_dtype, kernels):
    """Masked self-attention over the transposed cache [B, HD, C].
    q [B,S,H,Dh]; queries sit at positions n_past..n_past+S-1.
    Returns [B, S, d] f32."""
    b, s, h, dh = q.shape
    d = h * dh
    cache_len = k_cache.shape[-1]
    use_kernel = s == 1 and kernels is not None and kernels.flash_attention
    if use_kernel:
        from whisper_tpu.kernels.decode_attention import decode_attention_hd

        out = decode_attention_hd(
            q.reshape(b, 1, d).transpose(0, 2, 1), k_cache, v_cache, n_head,
            valid_len=n_past + 1, interpret=kernels.interpret,
        )                                                      # [B, HD, 1]
        return out.transpose(0, 2, 1)                          # [B, 1, d] f32
    k4 = k_cache.reshape(b, h, dh, cache_len)
    v4 = v_cache.reshape(b, h, dh, cache_len)
    scores = jnp.einsum("bthd,bhds->bhts", q, k4, preferred_element_type=jnp.float32)
    key_idx = jnp.arange(cache_len)[None, None, None, :]           # [1,1,1,C]
    q_pos = (n_past[:, None] + jnp.arange(s)[None, :])[:, None, :, None]  # [B,1,S,1]
    scores = jnp.where(key_idx <= q_pos, scores, jnp.float32(-1e30))
    p = jax.nn.softmax(scores, axis=-1).astype(compute_dtype)
    out = jnp.einsum("bhts,bhds->bthd", p, v4, preferred_element_type=jnp.float32)
    return out.reshape(b, s, d)


def _decoder_block(x, blk, kv, n_past, xk, xv, n_head, compute_dtype, kernels=None):
    """One decoder block. x [B,S,d]; kv ([B,HD,C], [B,HD,C]) transposed;
    xk/xv [B,HD,Sx] (transposed); n_past [B]. Returns (x, new_kv)."""
    b, s, d = x.shape

    # --- masked self-attention with KV append (scales folded at load) ---
    h = layer_norm(x, blk["attn_ln_w"], blk["attn_ln_b"]).astype(compute_dtype)
    q, k_new, v_new = qkv_proj(h, blk["qkv_w"], blk["qkv_b"], n_head)
    q = q.astype(compute_dtype)

    k_cache = _cache_append(kv[0], k_new.reshape(b, s, d).astype(compute_dtype), n_past)
    v_cache = _cache_append(kv[1], v_new.reshape(b, s, d).astype(compute_dtype), n_past)

    att = _self_attention(q, k_cache, v_cache, n_past, n_head, compute_dtype, kernels)
    x = x + dense(att.astype(compute_dtype), blk["o_w"], blk["o_b"]).astype(compute_dtype)

    # --- cross-attention over precomputed (pre-scaled, transposed) kvCross ---
    h = layer_norm(x, blk["x_ln_w"], blk["x_ln_b"]).astype(compute_dtype)
    att = _cross_attention(h, blk, xk, xv, n_head, compute_dtype, kernels)
    x = x + dense(att.astype(compute_dtype), blk["xo_w"], blk["xo_b"]).astype(compute_dtype)

    # --- MLP ---
    h = layer_norm(x, blk["mlp_ln_w"], blk["mlp_ln_b"]).astype(compute_dtype)
    h = gelu(dense(h, blk["fc1_w"], blk["fc1_b"])).astype(compute_dtype)
    x = x + dense(h, blk["fc2_w"], blk["fc2_b"]).astype(compute_dtype)
    return x, (k_cache, v_cache)


def decode_step(
    params,
    dims: ModelDims,
    tokens: jax.Array,        # [B, S] int32
    n_past: jax.Array,        # [B] int32
    self_kv: SelfKV,          # [L, B, HD, C] x2 (transposed)
    cross_kv: tuple[jax.Array, jax.Array],  # [L, B, HD, Sx] x2 (transposed)
    compute_dtype=jnp.bfloat16,
    logits_row: jax.Array | None = None,  # [B] row to project; None = all rows
    kernels=None,
):
    """Run the decoder on S tokens at per-lane positions n_past..n_past+S-1.

    Returns (logits, new_self_kv): logits [B, n_vocab] f32 when ``logits_row``
    is given (only that row pays the vocab matmul), else [B, S, n_vocab].
    """
    dec = params["dec"]
    b, s = tokens.shape
    n_past = n_past.astype(jnp.int32)

    pos = jax.vmap(
        lambda p: jax.lax.dynamic_slice_in_dim(dec["pos"], p, s, axis=0)
    )(n_past)                                              # [B, S, d]
    x = (dec["tok"][tokens] + pos).astype(compute_dtype)   # [B, S, d]

    def body(carry, layer):
        x = carry
        blk, kv_k, kv_v, xk, xv = layer
        x, (nk, nv) = _decoder_block(
            x, blk, (kv_k, kv_v), n_past, xk, xv, dims.n_text_head,
            compute_dtype, kernels,
        )
        return x, (nk, nv)

    x, (new_k, new_v) = jax.lax.scan(
        body, x, (dec["blocks"], self_kv.k, self_kv.v, cross_kv[0], cross_kv[1])
    )

    x = layer_norm(x, dec["ln_w"], dec["ln_b"])  # [B, S, d] f32
    if logits_row is not None:
        x = jnp.take_along_axis(x, logits_row[:, None, None], axis=1)[:, 0]  # [B, d]
    logits = jnp.dot(
        x.astype(compute_dtype),
        dec["tok"].T.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return logits, SelfKV(new_k, new_v)
