"""On-device decode loop vs a literal Python port of the reference loop.

The Python oracle below re-implements sampleBest + the runFullImpl token
loop (ContextImpl.cpp:71-169, 594-673) in numpy, stepping the SAME jitted
decode_step. The lax.while_loop version must produce identical tokens,
result_len, seek_delta, and failure flags.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def rt(tmp_path_factory):
    import jax.numpy as jnp

    from tests.helpers import TINY_TEST_DIMS, make_random_checkpoint, make_vocab_words
    from whisper_tpu.ggml import load_checkpoint
    from whisper_tpu.model.params import DtypePolicy, params_from_checkpoint
    from whisper_tpu.runtime.context import WhisperRuntime
    from whisper_tpu.runtime.sampler import SpecialIds
    from whisper_tpu.vocab import Vocabulary

    path = str(tmp_path_factory.mktemp("d") / "tiny.bin")
    make_random_checkpoint(path, TINY_TEST_DIMS, seed=3)
    cp = load_checkpoint(path)
    params = params_from_checkpoint(cp, DtypePolicy.f32())
    vocab = Vocabulary(make_vocab_words(cp.dims.n_vocab), cp.dims.n_vocab)
    rt = WhisperRuntime(
        params, cp.dims, SpecialIds.from_vocab(vocab), compute_dtype=jnp.float32
    )
    rng = np.random.default_rng(11)
    mel = rng.standard_normal((1, 80, 2 * cp.dims.n_audio_ctx)).astype(np.float32)
    _, cross = rt.encode_window(mel)
    return rt, cross


def _sample_best_np(probs, ids, is_initial, force_timestamp):
    """Literal numpy port of sampleBest (ContextImpl.cpp:71-157)."""
    probs = probs.astype(np.float64).copy()
    v = probs.shape[0]
    max_tx = probs[: ids.beg].max()
    if is_initial:
        probs[ids.beg + 101 :] = -np.inf
        hi = ids.beg + 101
    else:
        hi = v
    sum_ts = probs[ids.beg : hi].sum()
    tid = ids.beg + int(np.argmax(probs[ids.beg : hi]))
    max_ts = probs[tid]
    if sum_ts > max_tx or force_timestamp:
        probs[: ids.beg] = -np.inf
    pt = max_ts / (sum_ts + 1e-10)
    for banned in (ids.sot, ids.solm, ids.not_):
        probs[banned] = -np.inf
    chosen = int(np.argmax(probs))
    return chosen, tid, pt, sum_ts


def _reference_loop(rt, cross, prompt, seek, seek_end, max_tokens=0, single_segment=False):
    """Literal Python port of the runFullImpl token loop (594-673)."""
    import jax
    import jax.numpy as jnp

    from whisper_tpu.model.decoder import decode_step, init_self_kv

    dims = rt.dims
    ids = rt.ids
    n_max = dims.n_text_ctx // 2 - 4
    chunk = 3000

    kv = init_self_kv(dims, 1, dtype=jnp.float32)
    cur = np.array(prompt, np.int32)[None, :]
    n_past = 0
    logits, kv = decode_step(
        rt.params, dims, jnp.asarray(cur), jnp.zeros((1,), jnp.int32), kv, cross,
        compute_dtype=jnp.float32,
    )
    n_past = len(prompt)

    tokens = []
    seek_delta = chunk
    result_len = 0
    has_ts = False
    failed = False
    for i in range(n_max):
        probs = np.asarray(jax.nn.softmax(logits[0]))
        tok, tid, pt, ptsum = _sample_best_np(probs, ids, i == 0, i == 0)

        if tok > ids.beg:
            sd_new = 2 * (tok - ids.beg)
            if has_ts and seek_delta > sd_new and result_len < i:
                break
            seek_delta = sd_new
            result_len = i + 1
            has_ts = True

        tokens.append(tok)

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

        logits, kv = decode_step(
            rt.params, dims, jnp.asarray([[tok]]), jnp.asarray([n_past], jnp.int32),
            kv, cross, write_pos=n_past, compute_dtype=jnp.float32,
        )
        n_past += 1

    return tokens, result_len, seek_delta, failed


@pytest.mark.parametrize(
    "seek,seek_end,max_tokens,single",
    [
        (0, 100_000, 0, False),   # long audio: normal rules
        (0, 1_500, 0, False),     # short audio: end-of-audio path
        (0, 100_000, 5, False),   # max_tokens cutoff
        (0, 2_000, 0, True),      # single segment
    ],
)
def test_window_matches_python_oracle(rt, seek, seek_end, max_tokens, single):
    rt_, cross = rt
    vocabish = rt_.ids
    prompt = [vocabish.sot]

    ref_tokens, ref_len, ref_delta, ref_failed = _reference_loop(
        rt_, cross, prompt, seek, seek_end, max_tokens, single
    )

    padded = np.zeros((1, rt_.prompt_capacity), np.int32)
    padded[0, : len(prompt)] = prompt
    res = rt_.run_window(
        padded,
        np.full((1,), len(prompt), np.int32),
        cross,
        np.full((1,), seek, np.int32),
        np.full((1,), seek_end, np.int32),
        max_tokens=max_tokens,
        single_segment=single,
    )
    got_failed = bool(np.asarray(res.failed)[0])
    got_len = int(np.asarray(res.result_len)[0])
    got_delta = int(np.asarray(res.seek_delta)[0])
    got_tokens = list(np.asarray(res.tokens)[0])

    assert got_failed == ref_failed
    assert got_delta == ref_delta
    assert got_len == ref_len
    n_check = ref_len if not ref_failed else len(ref_tokens)
    assert got_tokens[:n_check] == ref_tokens[:n_check]
