"""Microbench for the decode-attention kernel: isolate DMA vs compute.

Variants over the same [B, HD, S] bf16 K/V streams as large-v2 cross-attn:
  read      — pure streaming reduction (the DMA speed-of-light for this grid)
  vpu       — k*q segment-sum scores + v*p lane-sum (original formulation)
  mxu       — head-masked dot_general formulation
Usage: PYTHONPATH=. python tools/kbench.py [CS=512 B=8 S=1500 HD=1280 H=20 L=32]
"""
from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(os.environ.get("B", "8"))
S = int(os.environ.get("S", "1500"))
HD = int(os.environ.get("HD", "1280"))
H = int(os.environ.get("H", "20"))
L = int(os.environ.get("L", "32"))
CS = int(os.environ.get("CS", "512"))
DH = HD // H


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ceil_to(x, m):
    return (x + m - 1) // m * m


S_PAD = ceil_to(S, CS)
N_CHUNKS = S_PAD // CS


def make_pallas(body, scratch):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, N_CHUNKS),
        in_specs=[
            pl.BlockSpec((1, HD, 1), lambda i, c, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HD, CS), lambda i, c, *_: (i, 0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HD, CS), lambda i, c, *_: (i, 0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, HD, 1), lambda i, c, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        body, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, HD, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * HD * S_PAD,
            bytes_accessed=2 * B * HD * S_PAD * 2,
            transcendentals=B * H * S_PAD,
        ),
    )


def kernel_read(lim, q_ref, k_ref, v_ref, o_ref, acc):
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        acc[...] = jnp.zeros((HD, 1), jnp.float32)

    k = k_ref[0]
    v = v_ref[0]
    acc[...] += jnp.sum(k.astype(jnp.float32) + v.astype(jnp.float32), axis=1,
                        keepdims=True)

    @pl.when(ci == N_CHUNKS - 1)
    def _():
        o_ref[0] = acc[...]


def kernel_vpu(lim, q_ref, k_ref, v_ref, o_ref, m_sc, l_sc, acc):
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        m_sc[...] = jnp.full((H, 1), -jnp.inf, jnp.float32)
        l_sc[...] = jnp.zeros((H, 1), jnp.float32)
        acc[...] = jnp.zeros((HD, 1), jnp.float32)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    scores = jnp.sum((k * q).reshape(H, DH, CS), axis=1)
    col = ci * CS + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col < S, scores, -jnp.inf)
    m_run = m_sc[...]
    m_new = jnp.maximum(m_run, jnp.max(scores, axis=-1, keepdims=True))
    alpha = jnp.exp(m_run - m_new)
    p = jnp.exp(scores - m_new)
    l_sc[...] = l_sc[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_sc[...] = m_new
    pb = jnp.broadcast_to(p[:, None, :], (H, DH, CS)).reshape(HD, CS)
    ab = jnp.broadcast_to(alpha[:, None, :], (H, DH, 1)).reshape(HD, 1)
    acc[...] = acc[...] * ab + jnp.sum(v * pb, axis=-1, keepdims=True)

    @pl.when(ci == N_CHUNKS - 1)
    def _():
        l = l_sc[...]
        lb = jnp.broadcast_to(l[:, None, :], (H, DH, 1)).reshape(HD, 1)
        o_ref[0] = acc[...] / lb


def kernel_mxu(lim, q_ref, k_ref, v_ref, o_ref, m_sc, l_sc, acc):
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        m_sc[...] = jnp.full((H, 1), -jnp.inf, jnp.float32)
        l_sc[...] = jnp.zeros((H, 1), jnp.float32)
        acc[...] = jnp.zeros((HD, 1), jnp.float32)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    row_head = jax.lax.broadcasted_iota(jnp.int32, (HD, H), 0) // DH
    col_head = jax.lax.broadcasted_iota(jnp.int32, (HD, H), 1)
    head_mask = (row_head == col_head).astype(q.dtype)
    qm = jnp.broadcast_to(q, (HD, H)) * head_mask
    scores = jax.lax.dot_general(qm, k, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    col = ci * CS + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col < S, scores, -jnp.inf)
    m_run = m_sc[...]
    m_new = jnp.maximum(m_run, jnp.max(scores, axis=-1, keepdims=True))
    alpha = jnp.exp(m_run - m_new)
    p = jnp.exp(scores - m_new)
    l_sc[...] = l_sc[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_sc[...] = m_new
    vp = jax.lax.dot_general(v, p.astype(v.dtype), (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    upd = jnp.sum(vp * head_mask.astype(jnp.float32), axis=1, keepdims=True)
    ab = jnp.broadcast_to(alpha[:, None, :], (H, DH, 1)).reshape(HD, 1)
    acc[...] = acc[...] * ab + upd

    @pl.when(ci == N_CHUNKS - 1)
    def _():
        l = l_sc[...]
        lb = jnp.broadcast_to(l[:, None, :], (H, DH, 1)).reshape(HD, 1)
        o_ref[0] = acc[...] / lb


def main():
    log(f"kbench B={B} S={S}(pad {S_PAD}) HD={HD} H={H} CS={CS} chunks={N_CHUNKS} L={L}")

    def fill(shape):
        i = jax.lax.broadcasted_iota(jnp.float32, shape, len(shape) - 1)
        j = jax.lax.broadcasted_iota(jnp.float32, shape, 0)
        return (jnp.sin(i * 0.37 + j) * 0.1).astype(jnp.bfloat16)

    k = fill((L, B, HD, S_PAD))
    v = fill((L, B, HD, S_PAD))
    q = fill((B, HD, 1))
    lim = jnp.zeros((B, 2), jnp.int32)
    gb = L * (k.size + v.size) / L * 2 / 1e9  # per full pass over L layers

    # fully-contiguous-row variant: blocks span all S (whole 3 KB rows)
    RB = int(os.environ.get("RB", "256"))

    def kernel_rows(lim, k_ref, v_ref, o_ref):
        o_ref[0] = jnp.sum(k_ref[0].astype(jnp.float32) + v_ref[0].astype(jnp.float32),
                           axis=1, keepdims=True)

    rows_call = pl.pallas_call(
        kernel_rows,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, HD // RB),
            in_specs=[
                pl.BlockSpec((1, RB, S_PAD), lambda i, r, *_: (i, r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RB, S_PAD), lambda i, r, *_: (i, r, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, RB, 1), lambda i, r, *_: (i, r, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B, HD, 1), jnp.float32),
    )

    def make_rows():
        def fn(lim, q, kk, vv):
            return rows_call(lim, kk, vv)
        return fn

    def xla_reduce(lim, q, kk, vv):
        return (jnp.sum(kk, axis=-1, keepdims=True, dtype=jnp.float32)
                + jnp.sum(vv, axis=-1, keepdims=True, dtype=jnp.float32))

    # ONE pallas call streaming every layer: grid (L, B, chunks). Isolates
    # per-call overhead (32 calls in the scan variants) from per-grid-step
    # overhead (same step count here).
    def kernel_read3(lim, k_ref, v_ref, o_ref, acc):
        ci = pl.program_id(2)

        @pl.when(ci == 0)
        def _():
            acc[...] = jnp.zeros((HD, 1), jnp.float32)

        acc[...] += jnp.sum(
            k_ref[0, 0].astype(jnp.float32) + v_ref[0, 0].astype(jnp.float32),
            axis=1, keepdims=True)

        @pl.when(ci == N_CHUNKS - 1)
        def _():
            o_ref[0, 0] = acc[...]

    read1_call = pl.pallas_call(
        kernel_read3,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L, B, N_CHUNKS),
            in_specs=[
                pl.BlockSpec((1, 1, HD, CS), lambda l, i, c, *_: (l, i, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, HD, CS), lambda l, i, c, *_: (l, i, 0, c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, HD, 1), lambda l, i, c, *_: (l, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((HD, 1), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((L, B, HD, 1), jnp.float32),
    )

    @jax.jit
    def _read1(q, k, v):
        return jnp.sum(read1_call(lim, k, v))

    def read1(q, k, v):
        return _read1(q, k, v)

    # batched per-head MXU dots: scores = q_h^T K_h and out = p_h V_h^T via
    # dot_general with H as a batch dim — streams K/V through the MXU (the
    # path measured fastest for the dense GEMVs) instead of VPU segment sums
    def kernel_mxub(lim, q_ref, k_ref, v_ref, o_ref, m_sc, l_sc, acc):
        ci = pl.program_id(1)

        @pl.when(ci == 0)
        def _():
            m_sc[...] = jnp.full((H, 1), -jnp.inf, jnp.float32)
            l_sc[...] = jnp.zeros((H, 1), jnp.float32)
            acc[...] = jnp.zeros((H, DH), jnp.float32)

        q = q_ref[0].reshape(H, DH, 1).astype(jnp.bfloat16)
        k = k_ref[0].reshape(H, DH, CS).astype(jnp.bfloat16)
        v = v_ref[0].reshape(H, DH, CS).astype(jnp.bfloat16)
        # [H, 1, CS] = sum_dh q[H,dh,1] * k[H,dh,CS]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]        # [H, CS]
        col = ci * CS + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < S, scores, -jnp.inf)
        m_run = m_sc[...]
        m_new = jnp.maximum(m_run, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_run - m_new)
        p = jnp.exp(scores - m_new)
        l_sc[...] = l_sc[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_sc[...] = m_new
        # [H, DH, 1] = sum_cs v[H,dh,CS] * p[H,CS,1]
        upd = jax.lax.dot_general(
            v, p[:, :, None].astype(jnp.bfloat16), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, :, 0]        # [H, DH]
        acc[...] = acc[...] * alpha + upd

        @pl.when(ci == N_CHUNKS - 1)
        def _():
            o_ref[0] = acc[...] / l_sc[...]

    mxub_inner = pl.pallas_call(
        kernel_mxub,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, N_CHUNKS),
            in_specs=[
                pl.BlockSpec((1, HD, 1), lambda i, c, *_: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, HD, CS), lambda i, c, *_: (i, 0, c), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, HD, CS), lambda i, c, *_: (i, 0, c), memory_space=pltpu.VMEM),
            ],
            # out as [H, DH] (heads on sublanes) — reshaping to [HD, 1] inside
            # the kernel is an unsupported lane->sublane relayout; the caller's
            # [B, H, DH] -> [B, HD, 1] reshape is free (contiguous)
            out_specs=pl.BlockSpec((1, H, DH), lambda i, c, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((H, 1), jnp.float32), pltpu.VMEM((H, 1), jnp.float32),
                pltpu.VMEM((H, DH), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, DH), jnp.float32),
    )

    def mxub_call(lim, q, kk, vv):
        return mxub_inner(lim, q, kk, vv).reshape(B, HD, 1)

    def kernel_vpu8(lim, q_ref, k_ref, v_ref, sk_ref, sv_ref, o_ref, m_sc, l_sc, acc):
        ci = pl.program_id(1)

        @pl.when(ci == 0)
        def _():
            m_sc[...] = jnp.full((H, 1), -jnp.inf, jnp.float32)
            l_sc[...] = jnp.zeros((H, 1), jnp.float32)
            acc[...] = jnp.zeros((HD, 1), jnp.float32)

        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)              # int8 -> f32
        v = v_ref[0].astype(jnp.float32)
        sk = sk_ref[0].astype(jnp.float32)            # [1, cs] per-column scale
        sv = sv_ref[0].astype(jnp.float32)
        scores = jnp.sum((k * q).reshape(H, DH, CS), axis=1) * sk
        col = ci * CS + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < S, scores, -jnp.inf)
        m_run = m_sc[...]
        m_new = jnp.maximum(m_run, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_run - m_new)
        p = jnp.exp(scores - m_new)
        l_sc[...] = l_sc[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_sc[...] = m_new
        p = p * sv
        pb = jnp.broadcast_to(p[:, None, :], (H, DH, CS)).reshape(HD, CS)
        ab = jnp.broadcast_to(alpha[:, None, :], (H, DH, 1)).reshape(HD, 1)
        acc[...] = acc[...] * ab + jnp.sum(v * pb, axis=-1, keepdims=True)

        @pl.when(ci == N_CHUNKS - 1)
        def _():
            l = l_sc[...]
            lb = jnp.broadcast_to(l[:, None, :], (H, DH, 1)).reshape(HD, 1)
            o_ref[0] = acc[...] / lb

    vpu8_call = pl.pallas_call(
        kernel_vpu8,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, N_CHUNKS),
            in_specs=[
                pl.BlockSpec((1, HD, 1), lambda i, c, *_: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, HD, CS), lambda i, c, *_: (i, 0, c), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, HD, CS), lambda i, c, *_: (i, 0, c), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, CS), lambda i, c, *_: (i, 0, c), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, CS), lambda i, c, *_: (i, 0, c), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, HD, 1), lambda i, c, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((H, 1), jnp.float32), pltpu.VMEM((H, 1), jnp.float32),
                pltpu.VMEM((HD, 1), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, HD, 1), jnp.float32),
    )

    variants = {
        "read": make_pallas(kernel_read, [pltpu.VMEM((HD, 1), jnp.float32)]),
        "rows": make_rows(),
        "xla": xla_reduce,
        "vpu": make_pallas(kernel_vpu, [
            pltpu.VMEM((H, 1), jnp.float32), pltpu.VMEM((H, 1), jnp.float32),
            pltpu.VMEM((HD, 1), jnp.float32)]),
        "mxu": make_pallas(kernel_mxu, [
            pltpu.VMEM((H, 1), jnp.float32), pltpu.VMEM((H, 1), jnp.float32),
            pltpu.VMEM((HD, 1), jnp.float32)]),
        "mxub": mxub_call,
    }
    ones = jnp.ones((S_PAD, int(os.environ.get("N", "128"))), jnp.bfloat16)

    @jax.jit
    def flat_reduce(q, k, v):
        return jnp.sum(k, dtype=jnp.float32) + jnp.sum(v, dtype=jnp.float32)

    @jax.jit
    def gemv_read(q, k, v):
        def layer(acc, kv):
            kk, vv = kv
            a = jax.lax.dot_general(kk, ones, (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            b2 = jax.lax.dot_general(vv, ones, (((2,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            return acc + a[0, 0, 0] + b2[0, 0, 0], None

        acc, _ = jax.lax.scan(layer, 0.0, (k, v))
        return acc

    @jax.jit
    def copy_scale(q, k, v):
        return k * jnp.bfloat16(2.0)  # 1.26 GB read + 1.26 GB write

    def flatread(q, k, v):
        # one pallas call over all layers: grid (L*B, chunks)
        k2 = k.reshape(L * B, HD, S_PAD)
        v2 = v.reshape(L * B, HD, S_PAD)
        sem = {"p": pltpu.PARALLEL, "a": pltpu.ARBITRARY}
        dims = [sem[c] for c in os.environ.get("SEMS", "aa")]
        call = pl.pallas_call(
            kernel_read,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(L * B, N_CHUNKS),
                in_specs=[
                    pl.BlockSpec((1, HD, 1), lambda i, c, *_: (0, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, HD, CS), lambda i, c, *_: (i, 0, c), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, HD, CS), lambda i, c, *_: (i, 0, c), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, HD, 1), lambda i, c, *_: (i, 0, 0), memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((HD, 1), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((L * B, HD, 1), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=tuple(dims),
                vmem_limit_bytes=int(os.environ.get("VMEM", str(64 * 2**20))),
            ),
        )
        return call(lim, q, k2, v2)

    flatread = jax.jit(flatread)

    @jax.jit
    def gemv2d(q, k, v):
        # one LARGE 2-D matmul per layer (no batch dim): [B*HD, S] @ [S, N]
        def layer(acc, kv):
            kk, vv = kv
            a = jnp.dot(kk.reshape(B * HD, S_PAD), ones,
                        preferred_element_type=jnp.float32)
            b2 = jnp.dot(vv.reshape(B * HD, S_PAD), ones,
                         preferred_element_type=jnp.float32)
            return acc + a[0, 0] + b2[0, 0], None

        acc, _ = jax.lax.scan(layer, 0.0, (k, v))
        return acc

    @jax.jit
    def _to_int8(x):
        return jnp.clip(x.astype(jnp.float32) * 1000, -127, 127).astype(jnp.int8)

    k8_all = _to_int8(k)
    v8_all = _to_int8(v)
    sc_all = jnp.ones((L, B, 1, S_PAD), jnp.float32)

    @jax.jit
    def _vpu8(q, k8, v8, sc):
        def layer(acc, kv8):
            kk, vv, sk, sv = kv8
            o = vpu8_call(lim, q, kk, vv, sk, sv)
            return acc + o[0, 0, 0], None

        acc, _ = jax.lax.scan(layer, 0.0, (k8, v8, sc, sc))
        return acc

    def vpu8(q, k, v):
        return _vpu8(q, k8_all, v8_all, sc_all)

    # weight-only int8 matmul through XLA (dequant epilogue fusion test):
    # 14*d*d weights per layer like the real decoder block
    DW = 14 * 1280
    Wb_all = jax.jit(lambda: fill((L, 1280, DW)), static_argnums=())()
    W8_all = _to_int8(Wb_all)
    wscale = jnp.ones((DW,), jnp.float32)
    x0w = jnp.ones((8, 1280), jnp.bfloat16)
    wgb = L * 1280 * DW / 1e9  # int8 GB per pass (x2 for bf16)

    @jax.jit
    def _w8mm(x0, W8):
        def layer(x, w8):
            y = jnp.dot(x, w8.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            y = y * wscale
            return (y[:, :1280].astype(jnp.bfloat16) * jnp.bfloat16(1e-3)), None

        x, _ = jax.lax.scan(layer, x0, W8)
        return x

    @jax.jit
    def _wbfmm(x0, Wb):
        def layer(x, wb):
            y = jnp.dot(x, wb, preferred_element_type=jnp.float32)
            return (y[:, :1280].astype(jnp.bfloat16) * jnp.bfloat16(1e-3)), None

        x, _ = jax.lax.scan(layer, x0, Wb)
        return x

    def w8mm(q, k, v):
        return _w8mm(x0w, W8_all)

    def wbfmm(q, k, v):
        return _wbfmm(x0w, Wb_all)

    whole = {"flat": flat_reduce, "gemv": gemv_read, "copy": copy_scale,
             "flatread": flatread, "gemv2d": gemv2d, "vpu8": vpu8,
             "w8mm": w8mm, "wbfmm": wbfmm, "read1": read1}

    sel = os.environ.get("VARIANTS", "read,vpu,mxu").split(",")
    for name in sel:
        if name in whole:
            loop = whole[name]
            out = loop(q, k, v)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            reps = 10
            for _ in range(reps):
                out = loop(q, k, v)
            jax.block_until_ready(out)
            ms = (time.perf_counter() - t0) / reps * 1e3
            log(f"{name:<6} {ms:8.3f} ms/pass  ({gb:.2f} GB -> {gb / (ms / 1e3):.0f} GB/s)")
            continue
        fn = variants[name]

        @jax.jit
        def loop(q, k, v):
            def layer(acc, kv):
                kk, vv = kv
                o = fn(lim, q, kk, vv)
                return acc + o[0, 0, 0], None

            acc, _ = jax.lax.scan(layer, 0.0, (k, v))
            return acc

        out = loop(q, k, v)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            out = loop(q, k, v)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / reps * 1e3
        log(f"{name:<6} {ms:8.3f} ms/pass  ({gb:.2f} GB -> {gb / (ms / 1e3):.0f} GB/s)")


if __name__ == "__main__":
    main()
