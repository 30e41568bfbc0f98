"""On-device beam-search window decode, batched over utterances.

The reference declares ``eSamplingStrategy::BeamSearch`` but never implements
it (sFullParams.h:12-13). This is a from-scratch TPU implementation:

  - beams COMPOSE with the batch dimension: U utterances x ``beam`` lanes
    ride one [U*beam]-lane decode, so the batched scheduler
    (runtime/batch.py) serves beam search with the same jitted step
  - the self-attention KV cache is lane-contiguous [L, U*beam, HD, C]; each
    step reorders by parent index ONLY the generated column region
    [p_max, p_max + n_max) — the prompt region is identical across beams of
    an utterance and is never copied (the round-2 implementation re-gathered
    the ENTIRE cache every token, reintroducing the full-cache-copy
    pathology the greedy path had eliminated)
  - the cross-attention kvCross is NOT broadcast per beam: the decode
    kernel's block index map points ``beam`` consecutive query lanes at one
    shared KV lane (``cross_group``, kernels/decode_attention.py) — no
    [U*beam]-wide HBM copy of the ~1 GB large-v2 cross cache exists
  - per-step token masking reuses whisper's sampleBest rules in log space
    (initial-timestamp restriction, sum_ts > max_tx -> text ban, banned
    specials) — identical numerics to the greedy path per beam
  - flatten-topk over [beam * V] candidate scores per utterance (OpenAI
    BeamSearchDecoder semantics); finished beams only propose EOT at
    unchanged score
  - winner = best average log-prob among finished beams (all beams if none
    finished), independently per utterance

The sliding-window/timestamp-failure rules (ContextImpl.cpp:594-673) are
applied by REPLAYING them over each winning token sequence on host — they
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
    logits: jax.Array       # [U*beam, V]
    scores: jax.Array       # [U*beam] cumulative log-prob
    finished: jax.Array     # [U*beam] bool
    length: jax.Array       # [U*beam] tokens emitted (excl. EOT continuations)
    tokens: jax.Array       # [U*beam, n_max]
    p: jax.Array            # [U*beam, n_max]
    pt: jax.Array
    ptsum: jax.Array
    tid: jax.Array          # [U*beam, n_max]


def _masked_logprobs(logits, ids: SpecialIds, is_initial):
    """sampleBest's masking rules in log space; also returns (tid, pt, ptsum)
    per lane, computed from the softmax distribution like the reference."""
    probs = jax.nn.softmax(logits, axis=-1)             # [lanes, V]
    logp = jnp.log(jnp.maximum(probs, 1e-30))
    lanes, v = logits.shape
    tok = jnp.arange(v, dtype=jnp.int32)[None, :]

    text_mask = tok < ids.beg
    ts_ok = (tok >= ids.beg) & jnp.where(is_initial, tok <= ids.beg + 100, True)

    max_tx = jnp.max(jnp.where(text_mask, probs, 0.0), axis=-1)     # [lanes]
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
    params, dims, ids: SpecialIds, prompts, prompt_lens, cross_kv, beam, n_max,
    compute_dtype, kernels=None,
):
    """prompts [U, P] right-padded, prompt_lens [U], cross_kv [L, U, HD, Sx]
    (+ optional int8 scales). Returns per-utterance winner arrays [U, n_max]."""
    v = dims.n_vocab
    u, p_max = prompts.shape
    lanes = u * beam
    assert p_max + n_max <= dims.n_text_ctx, (
        f"prompt capacity {p_max} + max steps {n_max} exceeds cache "
        f"length {dims.n_text_ctx}"
    )

    # --- prompt ingest on ALL beam lanes (identical content), left-aligned
    # so the shared write_pos / last-row-logits contract of decode_step holds ---
    prompt_lens = prompt_lens.astype(jnp.int32)
    aligned = jax.vmap(lambda row, l: jnp.roll(row, p_max - l))(prompts, prompt_lens)
    prompt_b = jnp.repeat(aligned, beam, axis=0)            # [lanes, P]
    plen_b = jnp.repeat(prompt_lens, beam)                  # [lanes]
    attn_start = p_max - plen_b
    kv = init_self_kv(
        dims, lanes, dtype=compute_dtype,
        quant=kernels.kv_int8 if kernels is not None else False,
    )
    logits0, kv = decode_step(
        params, dims, prompt_b, plen_b - p_max, kv, cross_kv,
        write_pos=0, attn_start=attn_start,
        compute_dtype=compute_dtype, kernels=kernels, cross_group=beam,
    )

    lane_ids = jnp.arange(lanes, dtype=jnp.int32)
    st = _BeamState(
        i=jnp.int32(0),
        kv=kv,
        logits=logits0,
        # only beam 0 of each utterance is live initially (identical lanes
        # would be clones)
        scores=jnp.where(lane_ids % beam == 0, 0.0, NEG).astype(jnp.float32),
        finished=jnp.zeros((lanes,), bool),
        length=jnp.zeros((lanes,), jnp.int32),
        tokens=jnp.zeros((lanes, n_max), jnp.int32),
        p=jnp.zeros((lanes, n_max), jnp.float32),
        pt=jnp.zeros((lanes, n_max), jnp.float32),
        ptsum=jnp.zeros((lanes, n_max), jnp.float32),
        tid=jnp.zeros((lanes, n_max), jnp.int32),
    )

    def cond(st: _BeamState):
        return (st.i < n_max) & jnp.any(~st.finished)

    def body(st: _BeamState) -> _BeamState:
        i = st.i
        logp, probs, tid, pt, ptsum = _masked_logprobs(st.logits, ids, i == 0)

        # finished beams: only an EOT self-loop at unchanged score
        eot_only = jnp.full((lanes, v), NEG).at[:, ids.eot].set(0.0)
        logp = jnp.where(st.finished[:, None], eot_only, logp)

        cand = (st.scores[:, None] + logp).reshape(u, beam * v)
        top_scores, flat_idx = jax.lax.top_k(cand, beam)     # [U, beam]
        parent = (flat_idx // v).astype(jnp.int32)           # [U, beam] < beam
        token = (flat_idx % v).reshape(-1).astype(jnp.int32)
        parent_g = (
            jnp.arange(u, dtype=jnp.int32)[:, None] * beam + parent
        ).reshape(-1)                                        # [lanes] global
        scores = top_scores.reshape(-1)

        # reorder by parent ONLY the generated cache columns — the prompt
        # region is beam-invariant, and columns beyond p_max+n_max don't exist
        def reorder(a):
            if a is None:
                return None
            gen = jax.lax.dynamic_slice_in_dim(a, p_max, n_max, axis=3)
            gen = jnp.take(gen, parent_g, axis=1)
            return jax.lax.dynamic_update_slice_in_dim(a, gen, p_max, axis=3)

        kv = SelfKV(*(reorder(a) for a in st.kv))
        tokens = st.tokens[parent_g]
        p_arr = st.p[parent_g]
        pt_arr = st.pt[parent_g]
        pts_arr = st.ptsum[parent_g]
        tid_arr = st.tid[parent_g]
        finished = st.finished[parent_g]
        length = st.length[parent_g]

        rec = ~finished
        tokens = tokens.at[:, i].set(jnp.where(rec, token, tokens[:, i]))
        p_arr = p_arr.at[:, i].set(
            jnp.where(rec, jnp.take_along_axis(probs[parent_g], token[:, None], 1)[:, 0], 0.0)
        )
        pt_arr = pt_arr.at[:, i].set(jnp.where(rec, pt[parent_g], 0.0))
        pts_arr = pts_arr.at[:, i].set(jnp.where(rec, ptsum[parent_g], 0.0))
        tid_arr = tid_arr.at[:, i].set(jnp.where(rec, tid[parent_g], 0))
        length = jnp.where(rec, i + 1, length)
        finished = finished | (token == ids.eot)

        n_past = plen_b + i
        logits, kv = decode_step(
            params, dims, token[:, None], n_past, kv, cross_kv,
            write_pos=p_max + i, attn_start=attn_start,
            compute_dtype=compute_dtype, kernels=kernels, cross_group=beam,
        )
        return _BeamState(
            i=i + 1, kv=kv, logits=logits, scores=scores,
            finished=finished, length=length, tokens=tokens,
            p=p_arr, pt=pt_arr, ptsum=pts_arr, tid=tid_arr,
        )

    st = jax.lax.while_loop(cond, body, st)

    # winner per utterance: best avg log-prob; finished beams strongly
    # preferred when any exist
    norm = (st.scores / jnp.maximum(st.length, 1)).reshape(u, beam)
    fin = st.finished.reshape(u, beam)
    pref = jnp.where(fin, norm, norm - 1e4)
    any_fin = jnp.any(fin, axis=1, keepdims=True)
    best = jnp.argmax(jnp.where(any_fin, pref, norm), axis=1)   # [U]
    sel = jnp.arange(u, dtype=jnp.int32) * beam + best
    return (
        st.tokens[sel], st.p[sel], st.pt[sel], st.ptsum[sel], st.tid[sel],
        st.length[sel], st.i,
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
    """Entry point shared by Context (U=1) and BatchTranscriber (U=batch):
    returns a WindowResult-shaped tuple of np arrays with one row per
    utterance, like the greedy ``run_window``."""
    beam = int(params.beam_width)
    dims = runtime.dims
    n_max = dims.n_text_ctx // 2 - 4

    prompts = np.atleast_2d(np.asarray(prompt, np.int32))
    u = prompts.shape[0]
    plens = np.broadcast_to(np.asarray(prompt_len, np.int32).reshape(-1), (u,))
    seeks = np.broadcast_to(np.asarray(seek, np.int64).reshape(-1), (u,))
    ends = np.broadcast_to(np.asarray(seek_end, np.int64).reshape(-1), (u,))

    tokens, p, pt, ptsum, tid, length, steps = _beam_window(
        runtime.params, dims, runtime.ids,
        jnp.asarray(prompts), jnp.asarray(plens), cross_kv,
        beam, n_max, runtime.compute_dtype, runtime.kernels,
    )
    tokens = np.asarray(tokens)
    length = np.asarray(length)

    result_len = np.zeros((u,), np.int32)
    seek_delta = np.zeros((u,), np.int32)
    failed = np.zeros((u,), bool)
    for uu in range(u):
        result_len[uu], seek_delta[uu], failed[uu] = _replay_window_rules(
            tokens[uu][: int(length[uu])], runtime.ids, int(seeks[uu]),
            int(ends[uu]), n_max,
            int(params.max_tokens), params.flag(Flags.SINGLE_SEGMENT),
        )

    return WindowResult(
        tokens=tokens,
        p=np.asarray(p),
        pt=np.asarray(pt),
        ptsum=np.asarray(ptsum),
        tid=np.asarray(tid),
        result_len=result_len,
        seek_delta=seek_delta,
        failed=failed,
        steps=np.asarray(int(steps), np.int32),
    )
