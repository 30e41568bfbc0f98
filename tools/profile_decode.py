"""Decode-step performance breakdown on the real chip.

The reference ships per-shader GPU timings (SampleClips/jfk-medium-1080ti.txt
:19-40 — mulMatTiled 562 ms, mulMatByRowTiled 256 ms, ...). This is the
analogue for the TPU decode loop: it times the full decode_step and then each
component in isolation (dense matmuls, self/cross attention kernels, KV
append, vocab logits), so the gap between measured ms/step and the
HBM-traffic lower bound is attributable.

Usage:  python tools/profile_decode.py  [MODEL=large-v2 B=8 STEPS=32 REPS=3]
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

from whisper_tpu.config import KernelConfig
from whisper_tpu.hparams import KNOWN_MODELS
from whisper_tpu.model.decoder import SelfKV, decode_step, init_self_kv, _cache_write
from whisper_tpu.model.layers import dense, gelu, layer_norm, qkv_proj

MODEL = os.environ.get("MODEL", "large-v2")
B = int(os.environ.get("B", "8"))
STEPS = int(os.environ.get("STEPS", "32"))
REPS = int(os.environ.get("REPS", "3"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(name, fn, *args, per_step_divisor=STEPS, traffic_gb=None):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / REPS / per_step_divisor * 1e3
    extra = ""
    if traffic_gb is not None:
        extra = f"  ({traffic_gb:.2f} GB -> {traffic_gb / (ms / 1e3):.0f} GB/s)"
    log(f"{name:<28} {ms:8.3f} ms/step{extra}")
    return ms


def main():
    dims = KNOWN_MODELS[MODEL]
    log(f"profile model={MODEL} B={B} steps={STEPS} devices={jax.devices()}")
    d = dims.n_text_state
    L = dims.n_text_layer
    H = dims.n_text_head
    C = dims.n_text_ctx
    Sx = dims.n_audio_ctx
    V = dims.n_vocab
    bf = jnp.bfloat16

    from whisper_tpu.tools.synthetic import make_synthetic_params

    KV_INT8 = os.environ.get("KV_INT8", "0") == "1"
    W_INT8 = os.environ.get("W_INT8", "0") == "1"
    params = make_synthetic_params(dims, bf, weights_int8=W_INT8)
    jax.block_until_ready(params)
    key = jax.random.PRNGKey(1)
    kv0 = init_self_kv(dims, B, bf, quant=KV_INT8)

    # cheap deterministic fill — jax.random at these shapes costs a remote
    # compile per shape, minutes of setup on axon
    def _fill(shape):
        i = jax.lax.broadcasted_iota(jnp.float32, shape, len(shape) - 1)
        j = jax.lax.broadcasted_iota(jnp.float32, shape, 0)
        return (jnp.sin(i * 0.37 + j) * 0.1).astype(bf)

    xk = _fill((L, B, d, Sx))
    xv = _fill((L, B, d, Sx))
    if KV_INT8:
        from whisper_tpu.kernels.quant import quantize_cols

        @jax.jit
        def _q(x):
            return quantize_cols(x, axis=-2)

        from whisper_tpu.model.encoder import CrossKV

        (xk, xk_s), (xv, xv_s) = _q(xk), _q(xv)
        cross = CrossKV(xk, xv, xk_s, xv_s)
    else:
        cross = (xk, xv)
    n_past0 = jnp.full((B,), 8, jnp.int32)
    tok = jnp.full((B, 1), 100, jnp.int32)
    blocks = params["dec"]["blocks"]

    gb = lambda n_elem: n_elem * 2 / 1e9  # bf16 bytes -> GB

    w_layer = 14 * d * d + (3 + 1 + 1 + 1 + 4 + 4) * d  # weights read per layer
    traffic = {
        "denses": gb(L * w_layer * 1.0),
        "self_kv": gb(2 * L * B * d * C),
        "cross_kv": gb(2 * L * B * d * Sx),
        "logits": gb(V * d),
    }
    log(
        f"HBM lower bound ~= {sum(traffic.values()):.2f} GB/step "
        f"({', '.join(f'{k}={v:.2f}' for k, v in traffic.items())})"
    )

    # ---- full decode_step loop (kernel + einsum paths) ----
    def full_loop(kernels):
        @jax.jit
        def run(params, kv, cross):
            def body(i, carry):
                kv, n_past, acc = carry
                logits, kv = decode_step(
                    params, dims, tok, n_past, kv, cross,
                    write_pos=n_past[0], kernels=kernels,
                )
                return kv, n_past + 1, acc + logits[0, 0]

            kv, n_past, acc = jax.lax.fori_loop(0, STEPS, body, (kv, n_past0, 0.0))
            return acc

        return run

    parts = set(os.environ.get("PARTS", "full,denses,self,cross,append,logits").split(","))
    kc = KernelConfig.auto()
    full_k = full_e = float("nan")
    if "full" in parts:
        full_k = bench("decode_step (pallas)", full_loop(kc), params, kv0, cross,
                       traffic_gb=sum(traffic.values()))
    if "einsum" in parts:
        full_e = bench("decode_step (einsum)", full_loop(None), params, kv0, cross,
                       traffic_gb=sum(traffic.values()))

    # ---- components ----
    x0 = _fill((B, 1, d))

    @jax.jit
    def denses_only(blocks, x0):
        def step(i, x):
            def layer(x, blk):
                h = layer_norm(x, blk["attn_ln_w"], blk["attn_ln_b"]).astype(bf)
                q, k_new, v_new = qkv_proj(h, blk["qkv_w"], blk["qkv_b"], H)
                att = (q.reshape(B, 1, d) + k_new.reshape(B, 1, d) + v_new.reshape(B, 1, d))
                x = x + dense(att.astype(bf), blk["o_w"], blk["o_b"]).astype(bf)
                h = layer_norm(x, blk["x_ln_w"], blk["x_ln_b"]).astype(bf)
                xq = dense(h, blk["xq_w"], blk["xq_b"]).astype(bf)
                x = x + dense(xq, blk["xo_w"], blk["xo_b"]).astype(bf)
                h = layer_norm(x, blk["mlp_ln_w"], blk["mlp_ln_b"]).astype(bf)
                h = gelu(dense(h, blk["fc1_w"], blk["fc1_b"])).astype(bf)
                x = x + dense(h, blk["fc2_w"], blk["fc2_b"]).astype(bf)
                return x, 0.0

            x, _ = jax.lax.scan(layer, x, blocks)
            return x

        return jax.lax.fori_loop(0, STEPS, step, x0)

    if "denses" in parts:
        bench("dense matmuls only", denses_only, blocks, x0, traffic_gb=traffic["denses"])

    # int8 weight variant: same loop, weights int8 with per-output-column
    # scales applied as a matmul epilogue (tests whether XLA fuses the
    # int8->bf16 convert into the dot's operand stream)
    W_KEYS = ("qkv_w", "o_w", "xq_w", "xo_w", "fc1_w", "fc2_w")

    @jax.jit
    def _quant_blocks(blocks):
        out = dict(blocks)
        for key in W_KEYS:
            w = blocks[key].astype(jnp.float32)
            amax = jnp.max(jnp.abs(w), axis=1, keepdims=True)      # [L,1,out]
            sc = jnp.maximum(amax, 1e-8) / 127.0
            out[key] = jnp.clip(jnp.round(w / sc), -127, 127).astype(jnp.int8)
            out[key + "_s"] = sc
        return out

    @jax.jit
    def denses8_only(blocks, x0):
        def dq_dense(x, w8, sc, b):
            y = jnp.dot(x, w8.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
            return y * sc + b

        def step(i, x):
            def layer(x, blk):
                h = layer_norm(x, blk["attn_ln_w"], blk["attn_ln_b"]).astype(bf)
                qkv = dq_dense(h, blk["qkv_w"], blk["qkv_w_s"], blk["qkv_b"])
                att = (qkv[..., :d] + qkv[..., d:2*d] + qkv[..., 2*d:]).astype(bf)
                x = x + dq_dense(att, blk["o_w"], blk["o_w_s"], blk["o_b"]).astype(bf)
                h = layer_norm(x, blk["x_ln_w"], blk["x_ln_b"]).astype(bf)
                xq = dq_dense(h, blk["xq_w"], blk["xq_w_s"], blk["xq_b"]).astype(bf)
                x = x + dq_dense(xq, blk["xo_w"], blk["xo_w_s"], blk["xo_b"]).astype(bf)
                h = layer_norm(x, blk["mlp_ln_w"], blk["mlp_ln_b"]).astype(bf)
                h = gelu(dq_dense(h, blk["fc1_w"], blk["fc1_w_s"], blk["fc1_b"])).astype(bf)
                x = x + dq_dense(h, blk["fc2_w"], blk["fc2_w_s"], blk["fc2_b"]).astype(bf)
                return x, 0.0

            x, _ = jax.lax.scan(layer, x, blocks)
            return x

        return jax.lax.fori_loop(0, STEPS, step, x0)

    if "denses8" in parts:
        blocks8 = _quant_blocks(blocks)
        jax.block_until_ready(blocks8)
        bench("dense matmuls int8", denses8_only, blocks8, x0,
              traffic_gb=traffic["denses"] / 2)

    from whisper_tpu.kernels.decode_attention import decode_attention_hd

    q1 = _fill((B, d, 1))

    def attn_loop(k_all, v_all, valid, label, tgb):
        # NB: the query must depend on the loop carry or XLA's while-loop
        # invariant code motion hoists the whole attention out of the fori
        # loop and the measurement is STEPS x too fast.
        @jax.jit
        def run(q1, k_all, v_all):
            def step(i, carry):
                q, acc = carry

                def layer(acc, kv):
                    k, v = kv
                    o = decode_attention_hd(q, k, v, H, valid_len=valid)
                    return acc + o[0, 0, 0], 0.0

                acc, _ = jax.lax.scan(layer, acc, (k_all, v_all))
                q = q + (acc * 1e-30).astype(q.dtype)
                return q, acc

            _, acc = jax.lax.fori_loop(0, STEPS, step, (q1, 0.0))
            return acc

        bench(label, run, q1, k_all, v_all, traffic_gb=tgb)

    if "self" in parts:
        attn_loop(kv0.k, kv0.v, n_past0 + 1, "self-attn kernel x L", traffic["self_kv"])
    if "cross" in parts:
        attn_loop(xk, xv, None, "cross-attn kernel x L", traffic["cross_kv"])

    k_new = _fill((B, 1, d))

    @jax.jit
    def append_loop(kv, k_new):
        # the production pattern: full caches carried through the layer scan,
        # one scalar-indexed DUS column write per layer (in-place under XLA's
        # while-loop aliasing — traffic is the new columns, not the cache)
        def step(i, kv):
            def layer(carry, li):
                def wr(c):
                    return _cache_write(
                        c, li, k_new[..., : c.shape[2]].astype(c.dtype), i)

                return jax.tree_util.tree_map(wr, carry), None

            nkv, _ = jax.lax.scan(layer, kv, jnp.arange(L, dtype=jnp.int32))
            return nkv

        return jax.lax.fori_loop(0, STEPS, step, kv)

    if "append" in parts:
        bench("kv write (in-place DUS)", append_loop, kv0, k_new,
              traffic_gb=gb(2 * L * B * d * 1))

    xrow = _fill((B, d))

    @jax.jit
    def logits_loop(tokw, xrow):
        # Carry xrow with a tiny dependency on each step's logits so XLA
        # cannot hoist the (otherwise loop-invariant) matmul out of the loop.
        def step(i, carry):
            x, acc = carry
            lg = jnp.dot(x, tokw.T, preferred_element_type=jnp.float32)
            x = x + (lg[:, :1] * 1e-30).astype(x.dtype)
            return x, acc + lg[0, 0]

        _, acc = jax.lax.fori_loop(0, STEPS, step, (xrow, 0.0))
        return acc

    if "logits" in parts:
        bench("vocab logits matmul", logits_loop, params["dec"]["tok"], xrow,
              traffic_gb=traffic["logits"])

    log(f"\nfull(pallas)={full_k:.2f} ms vs full(einsum)={full_e:.2f} ms")


if __name__ == "__main__":
    main()
