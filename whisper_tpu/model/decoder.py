"""Text decoder with preallocated self-attention KV cache.

Behavioral spec from the reference decodeLayer/decode
(WhisperContext.cpp:407-576,578-639):
  - embeddings: token_embedding[ids] + positional_embedding[n_past..]
    (the addRows shader, MlContext.cpp:588-618)
  - masked self-attention writes this step's K/V into the per-layer cache at
    offset n_past, then attends over entries <= query position
  - cross-attention reads the precomputed, pre-scaled kvCross
  - logits = ln(x) @ token_embedding^T

TPU-native differences: the cache is a single stacked [L, B, HD, C] pair
carried THROUGH the layer scan and updated with one scalar-indexed
``dynamic_update_slice`` per layer — XLA's while-loop aliasing keeps the
write in place, so a decode step writes only the new token's column instead
of copying the cache (the scan-ys formulation measured 6.8 ms/step of pure
cache copy on large-v2/B=8). ``n_past`` is a [B] vector so data-parallel
lanes and beams can sit at different prompt depths; shapes are static
(C = n_text_ctx); and the whole step is jit-compatible so the token loop
lives on device (no per-token host sync — the reference's central
bottleneck, WhisperContext.cpp:634-639).

Padded prompts are LEFT-aligned: every lane's tokens end at the same column
(p_max - 1), so the cache write position is a shared scalar (``write_pos``)
and the logits row is always the last row. Lanes with shorter prompts carry
garbage in columns < ``attn_start`` (= p_max - true_len); attention masks
keys below ``attn_start`` per lane, and pad query rows mix only among
themselves (every decoder op is row-local except self-attention, whose mask
confines real rows to real columns).
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


def _cache_write(cache: jax.Array, li, new: jax.Array, col) -> jax.Array:
    """In-place column write: cache [L,B,HD,C], new [B,S,HD], li/col scalars.

    A single dynamic_update_slice with scalar starts — the pattern XLA's
    while-loop in-place analysis is guaranteed to alias (no scatter, no
    per-lane indices)."""
    return jax.lax.dynamic_update_slice(
        cache, new.transpose(0, 2, 1)[None], (li, 0, 0, col)
    )


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


def _self_attention(q, k_cache, v_cache, write_pos, attn_start, n_head,
                    compute_dtype, kernels):
    """Masked self-attention over the transposed cache [B, HD, C].
    q [B,S,H,Dh]; queries sit at cache columns write_pos..write_pos+S-1.
    Per-lane valid keys are [attn_start_b, query_column]. Returns [B,S,d] f32."""
    b, s, h, dh = q.shape
    d = h * dh
    cache_len = k_cache.shape[-1]
    use_kernel = s == 1 and kernels is not None and kernels.flash_attention
    if use_kernel:
        from whisper_tpu.kernels.decode_attention import decode_attention_hd

        out = decode_attention_hd(
            q.reshape(b, 1, d).transpose(0, 2, 1), k_cache, v_cache, n_head,
            valid_len=jnp.broadcast_to(write_pos + 1, (b,)),
            start=attn_start, interpret=kernels.interpret,
        )                                                      # [B, HD, 1]
        return out.transpose(0, 2, 1)                          # [B, 1, d] f32
    k4 = k_cache.reshape(b, h, dh, cache_len)
    v4 = v_cache.reshape(b, h, dh, cache_len)
    scores = jnp.einsum("bthd,bhds->bhts", q, k4, preferred_element_type=jnp.float32)
    key_idx = jnp.arange(cache_len)[None, None, None, :]           # [1,1,1,C]
    q_pos = (write_pos + jnp.arange(s))[None, None, :, None]       # [1,1,S,1]
    lo = attn_start[:, None, None, None]                           # [B,1,1,1]
    # -1e30 (not -inf): fully-masked pad query rows (q_pos < attn_start)
    # softmax to a harmless uniform instead of NaN
    scores = jnp.where((key_idx <= q_pos) & (key_idx >= lo), scores,
                       jnp.float32(-1e30))
    p = jax.nn.softmax(scores, axis=-1).astype(compute_dtype)
    out = jnp.einsum("bhts,bhds->bthd", p, v4, preferred_element_type=jnp.float32)
    return out.reshape(b, s, d)


def _decoder_block(x, blk, k_full, v_full, li, write_pos, attn_start, xk, xv,
                   n_head, compute_dtype, kernels=None):
    """One decoder block operating on the FULL stacked cache.
    x [B,S,d]; k_full/v_full [L,B,HD,C]; li scalar layer index; xk/xv
    [B,HD,Sx] (transposed). Returns (x, k_full, v_full)."""
    b, s, d = x.shape

    # --- masked self-attention with in-place KV column write ---
    h = layer_norm(x, blk["attn_ln_w"], blk["attn_ln_b"]).astype(compute_dtype)
    q, k_new, v_new = qkv_proj(h, blk["qkv_w"], blk["qkv_b"], n_head)
    q = q.astype(compute_dtype)

    k_full = _cache_write(
        k_full, li, k_new.reshape(b, s, d).astype(k_full.dtype), write_pos)
    v_full = _cache_write(
        v_full, li, v_new.reshape(b, s, d).astype(v_full.dtype), write_pos)
    k_cache = jax.lax.dynamic_index_in_dim(k_full, li, 0, keepdims=False)
    v_cache = jax.lax.dynamic_index_in_dim(v_full, li, 0, keepdims=False)

    att = _self_attention(q, k_cache, v_cache, write_pos, attn_start, n_head,
                          compute_dtype, kernels)
    x = x + dense(att.astype(compute_dtype), blk["o_w"], blk["o_b"]).astype(compute_dtype)

    # --- cross-attention over precomputed (pre-scaled, transposed) kvCross ---
    h = layer_norm(x, blk["x_ln_w"], blk["x_ln_b"]).astype(compute_dtype)
    att = _cross_attention(h, blk, xk, xv, n_head, compute_dtype, kernels)
    x = x + dense(att.astype(compute_dtype), blk["xo_w"], blk["xo_b"]).astype(compute_dtype)

    # --- MLP ---
    h = layer_norm(x, blk["mlp_ln_w"], blk["mlp_ln_b"]).astype(compute_dtype)
    h = gelu(dense(h, blk["fc1_w"], blk["fc1_b"])).astype(compute_dtype)
    x = x + dense(h, blk["fc2_w"], blk["fc2_b"]).astype(compute_dtype)
    return x, k_full, v_full


def decode_step(
    params,
    dims: ModelDims,
    tokens: jax.Array,        # [B, S] int32 (left-aligned if padded)
    pos0: jax.Array,          # [B] int32: REAL position of tokens[:, 0]
    self_kv: SelfKV,          # [L, B, HD, C] x2 (transposed)
    cross_kv: tuple[jax.Array, jax.Array],  # [L, B, HD, Sx] x2 (transposed)
    write_pos=0,              # scalar int32: cache column of tokens[:, 0]
    attn_start: jax.Array | None = None,  # [B] first valid cache column
    compute_dtype=jnp.bfloat16,
    last_only: bool = True,   # logits only for the final row (left-aligned
                              # prompts put every lane's last real token there)
    kernels=None,
):
    """Run the decoder on S tokens at cache columns write_pos..write_pos+S-1.

    ``pos0`` is the real (unpadded) position used for positional embeddings;
    for a left-padded prompt of true length n in a [B, P] buffer it is n - P
    (pad rows clamp to position 0 — their outputs are masked garbage).
    Returns (logits, new_self_kv): logits [B, n_vocab] f32 when ``last_only``,
    else [B, S, n_vocab].
    """
    dec = params["dec"]
    b, s = tokens.shape
    write_pos = jnp.asarray(write_pos, jnp.int32)
    pos0 = jnp.asarray(pos0, jnp.int32)
    if attn_start is None:
        attn_start = jnp.zeros((b,), jnp.int32)

    n_ctx = dec["pos"].shape[0]
    pos_idx = jnp.clip(
        pos0[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :], 0, n_ctx - 1
    )                                                       # [B, S]
    x = (dec["tok"][tokens] + dec["pos"][pos_idx]).astype(compute_dtype)

    def body(carry, layer):
        x, kk, vv = carry
        li, blk, xk, xv = layer
        x, kk, vv = _decoder_block(
            x, blk, kk, vv, li, write_pos, attn_start, xk, xv,
            dims.n_text_head, compute_dtype, kernels,
        )
        return (x, kk, vv), None

    (x, new_k, new_v), _ = jax.lax.scan(
        body,
        (x, self_kv.k, self_kv.v),
        (jnp.arange(dims.n_text_layer, dtype=jnp.int32), dec["blocks"],
         cross_kv[0], cross_kv[1]),
    )

    x = layer_norm(x, dec["ln_w"], dec["ln_b"])  # [B, S, d] f32
    if last_only:
        x = x[:, -1]                             # [B, d]
    logits = jnp.dot(
        x.astype(compute_dtype),
        dec["tok"].T.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return logits, SelfKV(new_k, new_v)
