"""Pallas single-token attention for the decode loop.

Decode-step attention is a per-head GEMV: q [1, Dh] against K/V [S, Dh] for
every head. XLA lowers that einsum to H tiny batched matmuls and reaches a
fraction of HBM bandwidth — measured ~3 ms/step of the large-v2 decode
(the analogue of the reference's mulMatByRowTiled hot shader,
SampleClips/jfk-medium-1080ti.txt:20).

This kernel uses a TRANSPOSED layout, K/V as [B, H, Dh, S]:

  scores[1, S] = sum_over_sublanes( K[Dh, S] * q[Dh, 1] )   (VPU)
  p = softmax(scores + mask)                                 (lanes)
  out[Dh, 1]  = sum_over_lanes( V[Dh, S] * p[1, S] )         (VPU)

Everything is elementwise + reductions over a [Dh, S] tile streamed once —
bandwidth-bound by design. ``valid_len`` masks lanes >= n_past+1 for the
self-attention cache (per-batch-lane, prefetched to SMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


_CHUNK = 512   # bf16 S-chunk per grid step: blocks + f32 temps fit VMEM
_CHUNK8 = 1536  # int8 blocks are half-size -> 3x larger chunks, 3x fewer
                # grid steps (each step carries ~4 us fixed cost on v5e)


def _kernel(lo, hi, q_ref, k_ref, v_ref, sk_ref, sv_ref, o_ref,
            m_sc, l_sc, acc_sc, *,
            h: int, dh: int, cs: int, n_chunks: int, s_real: int, masked: bool):
    """One (batch, s-chunk) grid step with online-softmax scratch carried
    across the chunk axis. Blocks: q [1,HD,1]; k/v [1,HD,cs]; o [1,HD,1];
    optional per-column int8 scales sk/sv [1,1,cs] (None = unquantized).

    VPU formulation (segment-sum scores, lane-sum value product): measured
    faster than a head-masked MXU dot_general formulation (5.2 vs 5.8
    ms/step on large-v2 cross-attn) — this kernel is DMA-stream-bound, not
    compute-bound, so the cheapest compute path wins."""
    ci = pl.program_id(1)
    hd = h * dh

    @pl.when(ci == 0)
    def _():
        m_sc[...] = jnp.full((h, 1), -jnp.inf, jnp.float32)
        l_sc[...] = jnp.zeros((h, 1), jnp.float32)
        acc_sc[...] = jnp.zeros((hd, 1), jnp.float32)

    q = q_ref[0].astype(jnp.float32)                           # [HD, 1]
    k = k_ref[0].astype(jnp.float32)                           # [HD, cs]
    v = v_ref[0].astype(jnp.float32)

    scores = jnp.sum((k * q).reshape(h, dh, cs), axis=1)       # [H, cs]
    if sk_ref is not None:
        scores = scores * sk_ref[0]                            # [1, cs] bcast
    col = ci * cs + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    if masked:
        keep = (col >= lo) & (col < hi)
    else:
        keep = col < s_real
    # -1e30 (not -inf): a fully-masked chunk would otherwise leave the
    # running max at -inf and alpha = exp(-inf - -inf) = NaN
    scores = jnp.where(keep, scores, jnp.float32(-1e30))

    m_run = m_sc[...]
    m_new = jnp.maximum(m_run, jnp.max(scores, axis=-1, keepdims=True))
    alpha = jnp.exp(m_run - m_new)                             # [H, 1]
    p = jnp.exp(scores - m_new)                                # [H, cs]
    l_sc[...] = l_sc[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_sc[...] = m_new

    if sv_ref is not None:
        p = p * sv_ref[0]                                      # fold V dequant
    pb = jnp.broadcast_to(p[:, None, :], (h, dh, cs)).reshape(hd, cs)
    ab = jnp.broadcast_to(alpha[:, None, :], (h, dh, 1)).reshape(hd, 1)
    acc_sc[...] = acc_sc[...] * ab + jnp.sum(v * pb, axis=-1, keepdims=True)

    @pl.when(ci == n_chunks - 1)
    def _():
        l = l_sc[...]
        lb = jnp.broadcast_to(l[:, None, :], (h, dh, 1)).reshape(hd, 1)
        o_ref[0] = (acc_sc[...] / lb).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "kv_group", "interpret"))
def decode_attention_hd(
    q: jax.Array,                   # [B, H*Dh, 1]  (pre-scaled)
    k_t: jax.Array,                 # [B/G, H*Dh, S]  (pre-scaled, head-major rows)
    v_t: jax.Array,                 # [B/G, H*Dh, S]
    n_head: int,
    valid_len: jax.Array | None = None,  # [B] int32: keys < valid_len attended
    start: jax.Array | None = None,      # [B] int32: keys >= start attended
    k_scale: jax.Array | None = None,    # [B/G, 1, S] f32: int8 K column scales
    v_scale: jax.Array | None = None,    # [B/G, 1, S] f32: int8 V column scales
    kv_group: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """Single-query attention in flat head-major layout -> [B, H*Dh, 1] f32.

    One grid step per batch lane handles every head: the whole [HD, S] K/V
    tile streams through the VPU once (segment-sum over head row-groups).
    ``start``/``valid_len`` bound the attended key interval per lane — the
    left-padded-prompt cache keeps garbage in columns < start.
    ``k_scale``/``v_scale`` dequantize int8 K/V per column inside the kernel
    (kernels/quant.py) — folded into scores / softmax weights.

    ``kv_group``: G consecutive query lanes SHARE one K/V lane (beam-search
    cross-attention: beams of an utterance read the same kvCross) — the
    BlockSpec index map points lane i at K/V row i // G, so no [B]-wide
    broadcast copy of the cache is ever materialized in HBM."""
    b = q.shape[0]
    _, hd, s = k_t.shape
    assert b == k_t.shape[0] * kv_group, (b, k_t.shape, kv_group)
    dh = hd // n_head
    chunk = _CHUNK8 if k_t.dtype == jnp.int8 else _CHUNK
    # pad so the kernel's S-chunk loop divides evenly
    s_pad = _ceil_to(s, _LANE) if s <= chunk else _ceil_to(s, chunk)
    if s_pad != s:
        k_t = jnp.pad(k_t, ((0, 0), (0, 0), (0, s_pad - s)))
        v_t = jnp.pad(v_t, ((0, 0), (0, 0), (0, s_pad - s)))
        if k_scale is not None:
            k_scale = jnp.pad(k_scale, ((0, 0), (0, 0), (0, s_pad - s)))
        if v_scale is not None:
            v_scale = jnp.pad(v_scale, ((0, 0), (0, 0), (0, s_pad - s)))

    masked = valid_len is not None or start is not None
    if valid_len is None:
        valid_len = jnp.full((b,), s, jnp.int32)
    if start is None:
        start = jnp.zeros((b,), jnp.int32)
    scaled = k_scale is not None
    assert (v_scale is not None) == scaled, "k_scale/v_scale go together"

    cs = min(chunk, s_pad)
    n_chunks = s_pad // cs

    g = kv_group
    kv_spec = pl.BlockSpec((1, hd, cs), lambda i, c, *_: (i // g, 0, c),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, 1, cs), lambda i, c, *_: (i // g, 0, c),
                           memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, hd, 1), lambda i, c, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        kv_spec,
        kv_spec,
    ] + ([sc_spec, sc_spec] if scaled else [])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hd, 1), lambda i, c, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_head, 1), jnp.float32),
            pltpu.VMEM((n_head, 1), jnp.float32),
            pltpu.VMEM((hd, 1), jnp.float32),
        ],
    )

    def kernel(lim_pref, q_ref, k_ref, v_ref, *rest):
        sk_ref, sv_ref = (rest[0], rest[1]) if scaled else (None, None)
        o_ref, m_sc, l_sc, acc_sc = rest[2 if scaled else 0:]
        i = pl.program_id(0)
        _kernel(
            lim_pref[i, 0], lim_pref[i, 1], q_ref, k_ref, v_ref,
            sk_ref, sv_ref, o_ref, m_sc, l_sc, acc_sc,
            h=n_head, dh=dh, cs=cs, n_chunks=n_chunks, s_real=s, masked=masked,
        )

    limits = jnp.stack(
        [start.astype(jnp.int32), valid_len.astype(jnp.int32)], axis=1)  # [B,2]
    operands = [limits, q, k_t, v_t]
    if scaled:
        operands += [k_scale.astype(jnp.float32), v_scale.astype(jnp.float32)]
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hd, 1), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hd * s,
            bytes_accessed=(k_t.size + v_t.size) * k_t.dtype.itemsize,
            transcendentals=b * n_head * s,
        ),
    )(*operands)
    return out


def decode_attention(
    q: jax.Array,                   # [B, H, Dh]  (pre-scaled)
    k_t: jax.Array,                 # [B, H, Dh, S]  (pre-scaled)
    v_t: jax.Array,                 # [B, H, Dh, S]
    valid_len: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Convenience wrapper over decode_attention_hd -> [B, H, Dh] f32."""
    b, h, dh = q.shape
    s = k_t.shape[-1]
    out = decode_attention_hd(
        q.reshape(b, h * dh, 1),
        k_t.reshape(b, h * dh, s),
        v_t.reshape(b, h * dh, s),
        h, valid_len, interpret=interpret,
    )
    return out.reshape(b, h, dh)
