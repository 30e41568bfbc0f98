"""On-device 30 s-window decode loop.

The reference crosses the CPU<->GPU boundary twice per generated token
(token upload + probs readback, WhisperContext.cpp:578-639) and applies the
greedy/timestamp/termination rules on host (ContextImpl.cpp:594-673). On TPU
that pattern would be fatal (dispatch+transfer latency >> step time), so the
ENTIRE per-window token loop runs on device inside ``lax.while_loop``:

  prompt ingest (one padded decode_step, per-lane true lengths)
  -> loop: sample_best(softmax(logits)) -> timestamp-window rules ->
     termination rules -> decode_step(next token)
  -> one host transfer per window: token/prob arrays + flags.

Rule set re-expressed as masked lane updates (faithful to
ContextImpl.cpp:594-673):
  - timestamp token (id > beg): new seek_delta = 2*(id-beg); "do not go back
    in time" break when has_ts && seek_delta shrinks && result_len < i
  - EOT / max_tokens / end-of-audio terminate the lane; if no timestamp was
    ever accepted: end-of-audio keeps the tail (result_len = i+1), otherwise
    the lane is marked failed (host advances seek by +1 s)
  - at the step cap (n_text_ctx/2 - 4): repetition failure when no usable
    timestamp progress was made (result_len==0 or seek_delta < 1500)

Every lane of the batch carries independent state, so data-parallel windows
and (later) beams decode together.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from whisper_tpu.hparams import ModelDims, N_FRAMES
from whisper_tpu.model.decoder import SelfKV, decode_step
from whisper_tpu.runtime.sampler import SampleOut, SpecialIds, sample_best


class WindowResult(NamedTuple):
    tokens: jax.Array      # [B, n_max] int32 (valid up to result_len)
    p: jax.Array           # [B, n_max] f32
    pt: jax.Array          # [B, n_max] f32
    ptsum: jax.Array       # [B, n_max] f32
    tid: jax.Array         # [B, n_max] int32
    result_len: jax.Array  # [B] int32
    seek_delta: jax.Array  # [B] int32 (mel frames)
    failed: jax.Array      # [B] bool
    steps: jax.Array       # [] int32 — loop iterations executed (diagnostics)


class _LoopState(NamedTuple):
    i: jax.Array
    kv: SelfKV
    n_past: jax.Array      # [B]
    logits: jax.Array      # [B, V]
    tokens: jax.Array
    p: jax.Array
    pt: jax.Array
    ptsum: jax.Array
    tid: jax.Array
    seek_delta: jax.Array  # [B]
    result_len: jax.Array  # [B]
    has_ts: jax.Array      # [B] bool
    failed: jax.Array      # [B] bool
    done: jax.Array        # [B] bool


def decode_window(
    params,
    dims: ModelDims,
    ids: SpecialIds,
    prompt: jax.Array,       # [B, P] int32, right-padded
    prompt_len: jax.Array,   # [B] int32 true lengths (>= 1)
    self_kv: SelfKV,
    cross_kv,
    seek: jax.Array,         # [B] int32, mel-frame position of this window
    seek_end: jax.Array,     # [B] int32, mel-frame end of audio
    max_tokens: int = 0,
    single_segment: bool = False,
    compute_dtype=jnp.bfloat16,
    force_steps: int = 0,
    kernels=None,
) -> WindowResult:
    """``force_steps > 0`` is a benchmarking mode: termination rules are
    bypassed and exactly that many decode steps run — random-weight benches
    need a deterministic workload (tokens/window)."""
    b, p_max = prompt.shape
    n_max = dims.n_text_ctx // 2 - 4
    # cache headroom: the last write lands at column p_max + n_max - 1; if it
    # ever reached n_text_ctx, dynamic_update_slice would CLAMP the start and
    # silently overwrite the final column instead of failing
    assert p_max + n_max <= dims.n_text_ctx, (
        f"prompt capacity {p_max} + max steps {n_max} exceeds cache "
        f"length {dims.n_text_ctx}"
    )
    chunk_frames = N_FRAMES  # 100 * WHISPER_CHUNK_SIZE

    # ---- prompt ingest: left-align the right-padded prompt so every lane's
    # last real token sits at column p_max-1 (shared scalar write positions
    # keep the KV cache update a plain in-place dynamic_update_slice) ----
    prompt_len = prompt_len.astype(jnp.int32)
    attn_start = p_max - prompt_len                              # [B]
    prompt = jax.vmap(lambda row, l: jnp.roll(row, p_max - l))(prompt, prompt_len)
    logits0, kv = decode_step(
        params, dims, prompt, prompt_len - p_max, self_kv, cross_kv,
        write_pos=0, attn_start=attn_start,
        compute_dtype=compute_dtype, kernels=kernels,
    )

    st = _LoopState(
        i=jnp.int32(0),
        kv=kv,
        n_past=prompt_len.astype(jnp.int32),
        logits=logits0,
        tokens=jnp.zeros((b, n_max), jnp.int32),
        p=jnp.zeros((b, n_max), jnp.float32),
        pt=jnp.zeros((b, n_max), jnp.float32),
        ptsum=jnp.zeros((b, n_max), jnp.float32),
        tid=jnp.zeros((b, n_max), jnp.int32),
        seek_delta=jnp.full((b,), chunk_frames, jnp.int32),
        result_len=jnp.zeros((b,), jnp.int32),
        has_ts=jnp.zeros((b,), bool),
        failed=jnp.zeros((b,), bool),
        done=jnp.zeros((b,), bool),
    )

    def cond(st: _LoopState):
        return (st.i < n_max) & jnp.any(~st.done)

    def body(st: _LoopState) -> _LoopState:
        i = st.i
        active = ~st.done
        probs = jax.nn.softmax(st.logits, axis=-1)
        out: SampleOut = sample_best(
            probs, ids, is_initial=(i == 0), force_timestamp=(i == 0)
        )

        # --- timestamp sliding-window rules ---
        is_ts = out.id > ids.beg
        sd_new = 2 * (out.id - ids.beg)
        go_back = is_ts & st.has_ts & (st.seek_delta > sd_new) & (st.result_len < i) & active
        upd = is_ts & ~go_back & active
        seek_delta = jnp.where(upd, sd_new, st.seek_delta)
        result_len = jnp.where(upd, i + 1, st.result_len)
        has_ts = st.has_ts | upd

        # --- record the sampled token (not on break/done lanes) ---
        rec = active & ~go_back
        tokens = st.tokens.at[:, i].set(jnp.where(rec, out.id, 0))
        p_arr = st.p.at[:, i].set(jnp.where(rec, out.p, 0.0))
        pt_arr = st.pt.at[:, i].set(jnp.where(rec, out.pt, 0.0))
        pts_arr = st.ptsum.at[:, i].set(jnp.where(rec, out.ptsum, 0.0))
        tid_arr = st.tid.at[:, i].set(jnp.where(rec, out.tid, 0))

        # --- termination rules ---
        end_of_audio = seek + seek_delta + 100 >= seek_end
        eot_cond = (out.id == ids.eot) | (has_ts & end_of_audio)
        if max_tokens > 0:
            eot_cond = eot_cond | (i >= max_tokens)
        end_here = rec & eot_cond

        rl0 = result_len == 0
        result_len = jnp.where(end_here & rl0 & end_of_audio, i + 1, result_len)
        failed = st.failed | (end_here & rl0 & ~end_of_audio)
        if single_segment:
            result_len = jnp.where(end_here, i + 1, result_len)
            seek_delta = jnp.where(end_here, chunk_frames, seek_delta)

        done = st.done | go_back | end_here

        # --- repetition-loop failure at the step cap ---
        last = i == (n_max - 1)
        rep_fail = last & ~done & ((result_len == 0) | (seek_delta < chunk_frames // 2))
        failed = failed | rep_fail

        if force_steps > 0:  # bench mode: fixed-length decode
            done = jnp.broadcast_to(i + 1 >= force_steps, done.shape)
            failed = jnp.zeros_like(failed)
            result_len = jnp.where(done, i + 1, result_len)

        # --- decode the next token (runs for all lanes at the shared cache
        # column p_max+i; frozen lanes ignore the result — their garbage
        # columns sit beyond their recorded tokens) ---
        logits, kv = decode_step(
            params, dims, out.id[:, None], st.n_past,
            st.kv, cross_kv, write_pos=p_max + i, attn_start=attn_start,
            compute_dtype=compute_dtype, kernels=kernels,
        )
        n_past = jnp.where(rec, st.n_past + 1, st.n_past)

        return _LoopState(
            i=i + 1, kv=kv, n_past=n_past, logits=logits,
            tokens=tokens, p=p_arr, pt=pt_arr, ptsum=pts_arr, tid=tid_arr,
            seek_delta=seek_delta, result_len=result_len, has_ts=has_ts,
            failed=failed, done=done,
        )

    st = jax.lax.while_loop(cond, body, st)
    return WindowResult(
        tokens=st.tokens, p=st.p, pt=st.pt, ptsum=st.ptsum, tid=st.tid,
        result_len=st.result_len, seek_delta=st.seek_delta, failed=st.failed,
        steps=st.i,
    )
