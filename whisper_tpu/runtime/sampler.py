"""On-device greedy sampling with whisper's timestamp rules.

Vectorized, jit-compatible re-expression of the reference's ``sampleBest`` /
``sampleTimestamp`` (ContextImpl.cpp:71-169), which ran on host off a
downloaded probs vector. Exact rule set:

  1. max_tx = max prob over text tokens (ids < token_beg)
  2. initial step: timestamp candidates are restricted to the first 101
     timestamps; everything past token_beg+100 is banned outright
  3. sum_ts = sum of candidate timestamp probs; tid/max_ts = its argmax/max
  4. if sum_ts > max_tx (or forced): ban all text tokens
  5. ban sot/solm/not, take the argmax
     (the reference's top-4 partial sort + skip loop is equivalent: only
     those 3 ids are ever skipped, so top-4 always contains the best
     non-banned token)
  6. report p (prob of chosen), pt = max_ts/(sum_ts+1e-10), ptsum = sum_ts

All outputs are per-lane vectors so the decode loop can run batched/beamed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)


class SpecialIds(NamedTuple):
    """Static token ids baked into the jitted sampler (Vocabulary.h:27-36)."""

    eot: int
    sot: int
    prev: int
    solm: int
    not_: int
    beg: int
    translate: int = 50_358
    transcribe: int = 50_359

    @staticmethod
    def from_vocab(v) -> "SpecialIds":
        return SpecialIds(
            eot=v.token_eot,
            sot=v.token_sot,
            prev=v.token_prev,
            solm=v.token_solm,
            not_=v.token_not,
            beg=v.token_beg,
            translate=v.token_translate,
            transcribe=v.token_transcribe,
        )


class SampleOut(NamedTuple):
    id: jax.Array      # [B] int32 chosen token
    p: jax.Array       # [B] f32 prob of chosen token
    tid: jax.Array     # [B] int32 best timestamp token
    pt: jax.Array      # [B] f32 max_ts / (sum_ts + 1e-10)
    ptsum: jax.Array   # [B] f32 sum of timestamp probs


def sample_best(
    probs: jax.Array,            # [B, V] f32 (softmaxed)
    ids: SpecialIds,
    is_initial: jax.Array,       # [] or [B] bool
    force_timestamp: jax.Array,  # [] or [B] bool
) -> SampleOut:
    b, v = probs.shape
    tok = jnp.arange(v, dtype=jnp.int32)[None, :]          # [1, V]
    is_initial = jnp.broadcast_to(jnp.asarray(is_initial, bool), (b,))[:, None]
    force_timestamp = jnp.broadcast_to(jnp.asarray(force_timestamp, bool), (b,))[:, None]

    text_mask = tok < ids.beg                               # [1, V]
    # initial step restricts timestamps to [beg, beg+100] (decoding.py rule,
    # cited by the reference at ContextImpl.cpp:95-103)
    ts_ok = (tok >= ids.beg) & jnp.where(is_initial, tok <= ids.beg + 100, True)

    max_tx = jnp.max(jnp.where(text_mask, probs, NEG_INF), axis=-1)      # [B]
    ts_probs = jnp.where(ts_ok, probs, NEG_INF)
    sum_ts = jnp.sum(jnp.where(ts_ok, probs, 0.0), axis=-1)              # [B]
    tid = jnp.argmax(ts_probs, axis=-1).astype(jnp.int32)                # [B]
    max_ts = jnp.max(ts_probs, axis=-1)                                  # [B]

    take_ts = (sum_ts > max_tx)[:, None] | force_timestamp

    banned = (
        (tok == ids.sot) | (tok == ids.solm) | (tok == ids.not_)
        | (take_ts & text_mask)
        | (is_initial & (tok > ids.beg + 100))
    )
    scores = jnp.where(banned, NEG_INF, probs)
    chosen = jnp.argmax(scores, axis=-1).astype(jnp.int32)               # [B]
    p = jnp.take_along_axis(probs, chosen[:, None], axis=-1)[:, 0]

    return SampleOut(
        id=chosen,
        p=p,
        tid=tid,
        pt=max_ts / (sum_ts + 1e-10),
        ptsum=sum_ts,
    )
