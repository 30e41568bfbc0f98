"""Pallas fused attention for the encoder (and cross-attention prefill).

The TPU counterpart of the reference's flashAttention.hlsl
(ComputeShaders/flashAttention.hlsl:76-169; host MlContext.cpp:160-245):
keep the [Tq, Tk] score tile in VMEM, softmax there, and multiply by V —
the naive XLA path would round-trip ~T^2 scores per head through HBM, and
HBM bandwidth is the bottleneck (BASELINE.md: the reference is
memory-bound too).

At whisper's sizes (Tk = 1500, Dh = 64) a full key row fits VMEM easily
(1536 x 64 x 2 B = 192 KB), so each grid step processes one (batch*head,
q-block) pair against the entire K/V — no online-softmax pass is needed
(unlike true long-context flash attention).

Inputs are [B, T, H, Dh] with q,k ALREADY scaled by (d/h)^-0.25 (same
pre-scaling convention as the reference, WhisperContext.cpp:360-388).
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


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, tk_real: int, q_blk: int):
    """One (batch*head, q-block): q [q_blk, Dh], k/v [Tk_pad, Dh]."""
    q = q_ref[0]  # [q_blk, Dh]
    k = k_ref[0]  # [Tk_pad, Dh]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [q_blk, Tk_pad]

    tk_pad = s.shape[-1]
    if tk_real != tk_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < tk_real, s, -jnp.inf)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(v.dtype)

    o_ref[0] = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_blk", "interpret"))
def flash_attention(
    q: jax.Array,  # [B, Tq, H, Dh] pre-scaled
    k: jax.Array,  # [B, Tk, H, Dh] pre-scaled
    v: jax.Array,  # [B, Tk, H, Dh]
    q_blk: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Unmasked fused attention -> [B, Tq, H, Dh] (same dtype as v)."""
    b, tq, h, dh = q.shape
    tk = k.shape[1]
    tq_pad = _ceil_to(tq, q_blk)
    tk_pad = _ceil_to(tk, _LANE)

    # [B, T, H, Dh] -> [B*H, T_pad, Dh]
    def fold(x, t, t_pad):
        x = x.transpose(0, 2, 1, 3).reshape(b * h, t, dh)
        if t_pad != t:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        return x

    qf = fold(q, tq, tq_pad)
    kf = fold(k, tk, tk_pad)
    vf = fold(v, tk, tk_pad)

    grid = (b * h, tq_pad // q_blk)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, tk_real=tk, q_blk=q_blk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_blk, dh), lambda bh, i: (bh, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, dh), lambda bh, i: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, dh), lambda bh, i: (bh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, q_blk, dh), lambda bh, i: (bh, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_pad, dh), v.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq * tk * dh,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * tq * tk,
        ),
    )(qf, kf, vf)

    out = out[:, :tq].reshape(b, h, tq, dh).transpose(0, 2, 1, 3)
    return out
