"""On-device beam-search window decode.

The reference declares ``eSamplingStrategy::BeamSearch`` but never implements
it (sFullParams.h:12-13). This is a from-scratch TPU implementation:

  - beams are lanes of the batch dimension sharing stacked KV caches
    [L, beam, C, H, Dh]; each step re-gathers the cache by parent index
    (a [beam]-gather XLA fuses into the step)
  - per-step token masking reuses whisper's sampleBest rules in log space
    (initial-timestamp restriction, sum_ts > max_tx -> text ban, banned
    specials) — identical numerics to the greedy path per beam
  - flatten-topk over [beam * V] candidate scores (OpenAI BeamSearchDecoder
    semantics); finished beams only propose EOT at unchanged score
  - winner = best average log-prob among finished beams (all beams if none
    finished)

The sliding-window/timestamp-failure rules (ContextImpl.cpp:594-673) are
applied by REPLAYING them over the winning token sequence on host — they
only affect how the window advances, not which tokens are chosen, so the
replay is exact.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.api.params import Flags
from whisper_tpu.hparams import N_FRAMES
from whisper_tpu.model.decoder import SelfKV, decode_step, init_self_kv
from whisper_tpu.runtime.decode import WindowResult
from whisper_tpu.runtime.sampler import SpecialIds

NEG = jnp.float32(-1e30)


class _BeamState(NamedTuple):
    i: jax.Array
    kv: SelfKV
    logits: jax.Array       # [beam, V]
    scores: jax.Array       # [beam] cumulative log-prob
    finished: jax.Array     # [beam] bool
    length: jax.Array       # [beam] tokens emitted (excl. EOT continuations)
    tokens: jax.Array       # [beam, n_max]
    p: jax.Array            # [beam, n_max]
    pt: jax.Array
    ptsum: jax.Array
    tid: jax.Array          # [beam, n_max]


def _masked_logprobs(logits, ids: SpecialIds, is_initial):
    """sampleBest's masking rules in log space; also returns (tid, pt, ptsum)
    per beam, computed from the softmax distribution like the reference."""
    probs = jax.nn.softmax(logits, axis=-1)             # [beam, V]
    logp = jnp.log(jnp.maximum(probs, 1e-30))
    beam, v = logits.shape
    tok = jnp.arange(v, dtype=jnp.int32)[None, :]

    text_mask = tok < ids.beg
    ts_ok = (tok >= ids.beg) & jnp.where(is_initial, tok <= ids.beg + 100, True)

    max_tx = jnp.max(jnp.where(text_mask, probs, 0.0), axis=-1)     # [beam]
    sum_ts = jnp.sum(jnp.where(ts_ok, probs, 0.0), axis=-1)
    ts_probs = jnp.where(ts_ok, probs, -jnp.inf)
    tid = jnp.argmax(ts_probs, axis=-1).astype(jnp.int32)
    max_ts = jnp.max(ts_probs, axis=-1)
    pt = max_ts / (sum_ts + 1e-10)

    take_ts = (sum_ts > max_tx)[:, None] | is_initial   # initial forces ts
    banned = (
        (tok == ids.sot) | (tok == ids.solm) | (tok == ids.not_)
        | (take_ts & text_mask)
        | (is_initial & (tok > ids.beg + 100))
    )
    return jnp.where(banned, NEG, logp), probs, tid, pt, sum_ts


@functools.partial(
    jax.jit,
    static_argnames=("dims", "ids", "beam", "n_max", "compute_dtype", "kernels"),
)
def _beam_window(
    params, dims, ids: SpecialIds, prompt, prompt_len, cross_kv, beam, n_max,
    compute_dtype, kernels=None,
):
    v = dims.n_vocab
    p_max = prompt.shape[1]

    # --- prompt ingest on ALL beam lanes (identical content), left-aligned
    # so the shared write_pos / last-row-logits contract of decode_step holds ---
    prompt_b = jnp.broadcast_to(
        jnp.roll(prompt, p_max - prompt_len, axis=-1), (beam, p_max))
    plen_b = jnp.broadcast_to(prompt_len, (beam,)).astype(jnp.int32)
    attn_start = p_max - plen_b
    kv = init_self_kv(
        dims, beam, dtype=compute_dtype,
        quant=kernels.kv_int8 if kernels is not None else False,
    )
    cross_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (x.shape[0], beam) + x.shape[2:]), cross_kv
    )
    logits0, kv = decode_step(
        params, dims, prompt_b, plen_b - p_max, kv, cross_b,
        write_pos=0, attn_start=attn_start,
        compute_dtype=compute_dtype, kernels=kernels,
    )

    st = _BeamState(
        i=jnp.int32(0),
        kv=kv,
        logits=logits0,
        # only beam 0 is live initially (identical lanes would be clones)
        scores=jnp.where(jnp.arange(beam) == 0, 0.0, NEG).astype(jnp.float32),
        finished=jnp.zeros((beam,), bool),
        length=jnp.zeros((beam,), jnp.int32),
        tokens=jnp.zeros((beam, n_max), jnp.int32),
        p=jnp.zeros((beam, n_max), jnp.float32),
        pt=jnp.zeros((beam, n_max), jnp.float32),
        ptsum=jnp.zeros((beam, n_max), jnp.float32),
        tid=jnp.zeros((beam, n_max), jnp.int32),
    )

    def cond(st: _BeamState):
        return (st.i < n_max) & jnp.any(~st.finished)

    def body(st: _BeamState) -> _BeamState:
        i = st.i
        logp, probs, tid, pt, ptsum = _masked_logprobs(st.logits, ids, i == 0)

        # finished beams: only an EOT self-loop at unchanged score
        eot_only = jnp.full((beam, v), NEG).at[:, ids.eot].set(0.0)
        logp = jnp.where(st.finished[:, None], eot_only, logp)

        cand = st.scores[:, None] + logp                     # [beam, V]
        top_scores, flat_idx = jax.lax.top_k(cand.reshape(-1), beam)
        parent = (flat_idx // v).astype(jnp.int32)
        token = (flat_idx % v).astype(jnp.int32)

        # reorder all per-beam state by parent
        kv = jax.tree_util.tree_map(lambda a: a[:, parent], st.kv)
        tokens = st.tokens[parent]
        p_arr = st.p[parent]
        pt_arr = st.pt[parent]
        pts_arr = st.ptsum[parent]
        tid_arr = st.tid[parent]
        finished = st.finished[parent]
        length = st.length[parent]

        rec = ~finished
        tokens = tokens.at[:, i].set(jnp.where(rec, token, tokens[:, i]))
        p_arr = p_arr.at[:, i].set(
            jnp.where(rec, jnp.take_along_axis(probs[parent], token[:, None], 1)[:, 0], 0.0)
        )
        pt_arr = pt_arr.at[:, i].set(jnp.where(rec, pt[parent], 0.0))
        pts_arr = pts_arr.at[:, i].set(jnp.where(rec, ptsum[parent], 0.0))
        tid_arr = tid_arr.at[:, i].set(jnp.where(rec, tid[parent], 0))
        length = jnp.where(rec, i + 1, length)
        finished = finished | (token == ids.eot)

        n_past = plen_b + i
        logits, kv = decode_step(
            params, dims, token[:, None], n_past, kv, cross_b,
            write_pos=p_max + i, attn_start=attn_start,
            compute_dtype=compute_dtype, kernels=kernels,
        )
        return _BeamState(
            i=i + 1, kv=kv, logits=logits, scores=top_scores,
            finished=finished, length=length, tokens=tokens,
            p=p_arr, pt=pt_arr, ptsum=pts_arr, tid=tid_arr,
        )

    st = jax.lax.while_loop(cond, body, st)

    # winner: best avg log-prob; finished beams strongly preferred
    norm = st.scores / jnp.maximum(st.length, 1)
    pref = jnp.where(st.finished, norm, norm - 1e4)
    pick_any_finished = jnp.any(st.finished)
    best = jnp.argmax(jnp.where(pick_any_finished, pref, norm))
    return (
        st.tokens[best], st.p[best], st.pt[best], st.ptsum[best], st.tid[best],
        st.length[best], st.i,
    )


def _replay_window_rules(tokens, ids: SpecialIds, seek, seek_end, n_max,
                         max_tokens, single_segment):
    """Host replay of ContextImpl.cpp:594-673 over a fixed token sequence."""
    chunk = N_FRAMES
    seek_delta = chunk
    result_len = 0
    has_ts = False
    failed = False
    kept = 0
    for i, tok in enumerate(tokens):
        tok = int(tok)
        if tok > ids.beg:
            sd_new = 2 * (tok - ids.beg)
            if has_ts and seek_delta > sd_new and result_len < i:
                break
            seek_delta = sd_new
            result_len = i + 1
            has_ts = True
        kept = i + 1
        eoa = seek + seek_delta + 100 >= seek_end
        if tok == ids.eot or (max_tokens > 0 and i >= max_tokens) or (has_ts and eoa):
            if result_len == 0:
                if eoa:
                    result_len = i + 1
                else:
                    failed = True
                    break
            if single_segment:
                result_len = i + 1
                seek_delta = chunk
            break
        if i == n_max - 1 and (result_len == 0 or seek_delta < chunk // 2):
            failed = True
            break
    else:
        if kept and (result_len == 0 or seek_delta < chunk // 2):
            failed = True
    return result_len, seek_delta, failed


def decode_window_beam(runtime, params, prompt, prompt_len, cross_kv, seek, seek_end):
    """Context entry point: returns a WindowResult-shaped dict of np arrays
    (B=1) like the greedy path."""
    beam = int(params.beam_width)
    dims = runtime.dims
    n_max = dims.n_text_ctx // 2 - 4

    tokens, p, pt, ptsum, tid, length, steps = _beam_window(
        runtime.params, dims, runtime.ids,
        jnp.asarray(prompt, jnp.int32), jnp.int32(prompt_len), cross_kv,
        beam, n_max, runtime.compute_dtype, runtime.kernels,
    )
    tokens = np.asarray(tokens)
    length = int(length)

    result_len, seek_delta, failed = _replay_window_rules(
        tokens[:length], runtime.ids, int(seek), int(seek_end), n_max,
        int(params.max_tokens), params.flag(Flags.SINGLE_SEGMENT),
    )

    return WindowResult(
        tokens=tokens[None, :],
        p=np.asarray(p)[None, :],
        pt=np.asarray(pt)[None, :],
        ptsum=np.asarray(ptsum)[None, :],
        tid=np.asarray(tid)[None, :],
        result_len=np.asarray([result_len], np.int32),
        seek_delta=np.asarray([seek_delta], np.int32),
        failed=np.asarray([failed]),
        steps=np.asarray(int(steps), np.int32),
    )
