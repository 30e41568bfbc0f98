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
    tiles through the decode-attention kernel.

    When int8-quantized (kernels/quant.py), k/v are int8 and k_s/v_s hold
    per-column f32 scales [L, B, 1, C]; otherwise k_s/v_s are None."""

    k: jax.Array  # [L, B, HD, C]
    v: jax.Array  # [L, B, HD, C]
    k_s: jax.Array | None = None  # [L, B, 1, C] f32 (int8 mode)
    v_s: jax.Array | None = None


def init_self_kv(
    dims: ModelDims, batch: int, dtype=jnp.bfloat16,
    cache_len: int | None = None, quant: bool = False,
) -> SelfKV:
    shape = (
        dims.n_text_layer,
        batch,
        dims.n_text_state,
        cache_len or dims.n_text_ctx,
    )
    if quant:
        sshape = shape[:2] + (1, shape[3])
        return SelfKV(
            jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
            jnp.zeros(sshape, jnp.float32), jnp.zeros(sshape, jnp.float32),
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


def _cross_attention(h, blk, xk, xv, xk_s, xv_s, n_head, compute_dtype, kernels,
                     cross_group: int = 1):
    """Cross-attention over transposed kvCross [B/G, HD, Sx] (optionally int8
    with per-column scales xk_s/xv_s [B/G, 1, Sx]).
    ``cross_group`` G consecutive query lanes share one kvCross lane (beam
    search: one encoded window per utterance, beams ride the batch axis).
    h: normalized input [B, S, d]. Returns [B, S, d] f32 context."""
    b, s, d = h.shape
    q = dense(h, blk["xq_w"], blk["xq_b"],
              s=blk.get("xq_w_s")).astype(compute_dtype)          # [B, S, HD]
    use_kernel = (
        s == 1 and kernels is not None and kernels.flash_attention
    )
    if use_kernel:
        from whisper_tpu.kernels.decode_attention import decode_attention_hd

        out = decode_attention_hd(
            q.transpose(0, 2, 1), xk, xv, n_head,
            k_scale=xk_s, v_scale=xv_s, kv_group=cross_group,
            interpret=kernels.interpret,
        )                                                      # [B, HD, 1]
        return out.transpose(0, 2, 1)                          # [B, 1, HD] f32
    # einsum path (prompt ingest / reference numerics)
    if xk_s is not None:
        from whisper_tpu.kernels.quant import dequantize

        xk = dequantize(xk, xk_s, compute_dtype)
        xv = dequantize(xv, xv_s, compute_dtype)
    dh = d // n_head
    sx = xk.shape[-1]
    u = b // cross_group
    # grouped lanes fold into the (row) position axis: cross-attention has no
    # positional mask, so beams and positions are interchangeable rows
    q4 = q.reshape(u, cross_group * s, n_head, dh)
    k4 = xk.reshape(u, n_head, dh, sx)
    v4 = xv.reshape(u, n_head, dh, sx)
    scores = jnp.einsum("bthd,bhds->bhts", q4, k4, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(scores, axis=-1).astype(compute_dtype)
    out = jnp.einsum("bhts,bhds->bthd", p, v4, preferred_element_type=jnp.float32)
    return out.reshape(b, s, d)


def _self_attention(q, k_cache, v_cache, k_s, v_s, write_pos, attn_start,
                    n_head, compute_dtype, kernels):
    """Masked self-attention over the transposed cache [B, HD, C] (optionally
    int8 with per-column scales k_s/v_s [B, 1, C]).
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
            start=attn_start, k_scale=k_s, v_scale=v_s,
            interpret=kernels.interpret,
        )                                                      # [B, HD, 1]
        return out.transpose(0, 2, 1)                          # [B, 1, d] f32
    if k_s is not None:
        from whisper_tpu.kernels.quant import dequantize

        k_cache = dequantize(k_cache, k_s, compute_dtype)
        v_cache = dequantize(v_cache, v_s, compute_dtype)
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


def _decoder_block(x, blk, kv: SelfKV, li, write_pos, attn_start, xk, xv,
                   xk_s, xv_s, n_head, compute_dtype, kernels=None,
                   cross_group: int = 1):
    """One decoder block operating on the FULL stacked cache.
    x [B,S,d]; kv holds [L,B,HD,C] caches (+ scales when int8); li scalar
    layer index; xk/xv [B/G,HD,Sx] (transposed, + optional scales [B/G,1,Sx],
    shared across ``cross_group`` consecutive lanes).
    Returns (x, kv)."""
    b, s, d = x.shape
    quant = kv.k_s is not None

    # --- masked self-attention with in-place KV column write ---
    h = layer_norm(x, blk["attn_ln_w"], blk["attn_ln_b"]).astype(compute_dtype)
    q, k_new, v_new = qkv_proj(h, blk["qkv_w"], blk["qkv_b"], n_head,
                               qkv_s=blk.get("qkv_w_s"))
    q = q.astype(compute_dtype)
    k_new = k_new.reshape(b, s, d)
    v_new = v_new.reshape(b, s, d)

    if quant:
        from whisper_tpu.kernels.quant import quantize_cols

        k_q, k_sc = quantize_cols(k_new, axis=-1)   # int8 [B,S,HD], f32 [B,S,1]
        v_q, v_sc = quantize_cols(v_new, axis=-1)
        kv = SelfKV(
            _cache_write(kv.k, li, k_q, write_pos),
            _cache_write(kv.v, li, v_q, write_pos),
            _cache_write(kv.k_s, li, k_sc, write_pos),
            _cache_write(kv.v_s, li, v_sc, write_pos),
        )
    else:
        kv = SelfKV(
            _cache_write(kv.k, li, k_new.astype(kv.k.dtype), write_pos),
            _cache_write(kv.v, li, v_new.astype(kv.v.dtype), write_pos),
        )
    sl = lambda a: (jax.lax.dynamic_index_in_dim(a, li, 0, keepdims=False)
                    if a is not None else None)
    att = _self_attention(q, sl(kv.k), sl(kv.v), sl(kv.k_s), sl(kv.v_s),
                          write_pos, attn_start, n_head, compute_dtype, kernels)
    x = x + dense(att.astype(compute_dtype), blk["o_w"], blk["o_b"],
                  s=blk.get("o_w_s")).astype(compute_dtype)

    # --- cross-attention over precomputed (pre-scaled, transposed) kvCross ---
    h = layer_norm(x, blk["x_ln_w"], blk["x_ln_b"]).astype(compute_dtype)
    att = _cross_attention(h, blk, xk, xv, xk_s, xv_s, n_head, compute_dtype,
                           kernels, cross_group)
    x = x + dense(att.astype(compute_dtype), blk["xo_w"], blk["xo_b"],
                  s=blk.get("xo_w_s")).astype(compute_dtype)

    # --- MLP ---
    h = layer_norm(x, blk["mlp_ln_w"], blk["mlp_ln_b"]).astype(compute_dtype)
    h = gelu(dense(h, blk["fc1_w"], blk["fc1_b"], s=blk.get("fc1_w_s"))).astype(compute_dtype)
    x = x + dense(h, blk["fc2_w"], blk["fc2_b"], s=blk.get("fc2_w_s")).astype(compute_dtype)
    return x, kv


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
    cross_group: int = 1,     # G query lanes share one cross_kv lane (beams)
):
    """Run the decoder on S tokens at cache columns write_pos..write_pos+S-1.

    ``pos0`` is the real (unpadded) position used for positional embeddings;
    for a left-padded prompt of true length n in a [B, P] buffer it is n - P
    (pad rows clamp to position 0 — their outputs are masked garbage).
    ``cross_group``: cross_kv carries B/cross_group lanes, each shared by
    ``cross_group`` consecutive batch lanes (beam search).
    Returns (logits, new_self_kv): logits [B, n_vocab] f32 when ``last_only``,
    else [B, S, n_vocab].
    """
    dec = params["dec"]
    b, s = tokens.shape
    write_pos = jnp.asarray(write_pos, jnp.int32)
    pos0 = jnp.asarray(pos0, jnp.int32)
    if attn_start is None:
        attn_start = jnp.zeros((b,), jnp.int32)
    # cross_kv: (k, v) tuple or encoder.CrossKV (k, v, k_s, v_s) when int8
    xk_s = cross_kv[2] if len(cross_kv) > 2 else None
    xv_s = cross_kv[3] if len(cross_kv) > 2 else None
    cross_quant = xk_s is not None
    self_quant = self_kv.k_s is not None

    n_ctx = dec["pos"].shape[0]
    pos_idx = jnp.clip(
        pos0[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :], 0, n_ctx - 1
    )                                                       # [B, S]
    emb = dec["tok"][tokens]
    if "tok_s" in dec:                # int8 embedding: dequant gathered rows
        emb = emb.astype(jnp.float32) * dec["tok_s"][tokens]
    x = (emb + dec["pos"][pos_idx]).astype(compute_dtype)

    def body(carry, layer):
        x, kv = carry
        if cross_quant:
            li, blk, xk, xv, xks, xvs = layer
        else:
            li, blk, xk, xv = layer
            xks = xvs = None
        x, kv = _decoder_block(
            x, blk, kv, li, write_pos, attn_start, xk, xv, xks, xvs,
            dims.n_text_head, compute_dtype, kernels, cross_group,
        )
        return (x, kv), None

    carry0 = (x, self_kv if self_quant else SelfKV(self_kv.k, self_kv.v))
    xs = (jnp.arange(dims.n_text_layer, dtype=jnp.int32), dec["blocks"],
          cross_kv[0], cross_kv[1])
    if cross_quant:
        xs = xs + (xk_s, xv_s)
    (x, new_kv), _ = jax.lax.scan(body, carry0, xs)

    x = layer_norm(x, dec["ln_w"], dec["ln_b"])  # [B, S, d] f32
    if last_only:
        x = x[:, -1]                             # [B, d]
    logits = jnp.dot(
        x.astype(compute_dtype),
        dec["tok"].T.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    if "tok_s" in dec:          # int8 logits: per-vocab-row scale epilogue
        logits = logits * jnp.moveaxis(dec["tok_s"], 0, -1)
    return logits, new_kv
