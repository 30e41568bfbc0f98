"""Beam search tests.

Beam=1 must equal greedy up to the first EOT/termination (same masking rules,
single lane). Larger beams must never score worse than greedy.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import jax.numpy as jnp

    from tests.helpers import TINY_TEST_DIMS, make_random_checkpoint, make_vocab_words
    from whisper_tpu.ggml import load_checkpoint
    from whisper_tpu.model.params import DtypePolicy, params_from_checkpoint
    from whisper_tpu.runtime.context import WhisperRuntime
    from whisper_tpu.runtime.sampler import SpecialIds
    from whisper_tpu.vocab import Vocabulary

    path = str(tmp_path_factory.mktemp("b") / "tiny.bin")
    make_random_checkpoint(path, TINY_TEST_DIMS, seed=21)
    cp = load_checkpoint(path)
    params = params_from_checkpoint(cp, DtypePolicy.f32())
    vocab = Vocabulary(make_vocab_words(cp.dims.n_vocab), cp.dims.n_vocab)
    rt = WhisperRuntime(
        params, cp.dims, SpecialIds.from_vocab(vocab), compute_dtype=jnp.float32
    )
    rng = np.random.default_rng(31)
    mel = rng.standard_normal((1, 80, 2 * cp.dims.n_audio_ctx)).astype(np.float32)
    _, cross = rt.encode_window(mel)
    return rt, cross


def _greedy(rt, cross, seek_end=10**6):
    prompt = [rt.ids.sot]
    padded = np.zeros((1, rt.prompt_capacity), np.int32)
    padded[0, : len(prompt)] = prompt
    return rt.run_window(
        padded, np.full((1,), len(prompt), np.int32), cross,
        np.zeros((1,), np.int32), np.full((1,), seek_end, np.int32),
    )


def _beam(rt, cross, width, seek_end=10**6):
    from whisper_tpu.api.params import FullParams, SamplingStrategy
    from whisper_tpu.runtime.beam import decode_window_beam

    params = FullParams(strategy=SamplingStrategy.BEAM_SEARCH, beam_width=width)
    prompt = [rt.ids.sot]
    padded = np.zeros((1, rt.prompt_capacity), np.int32)
    padded[0, : len(prompt)] = prompt
    return decode_window_beam(rt, params, padded, len(prompt), cross, 0, seek_end)


def test_beam1_matches_greedy(setup):
    rt, cross = setup
    g = _greedy(rt, cross)
    b = _beam(rt, cross, 1)
    g_len = int(np.asarray(g.result_len)[0])
    b_len = int(b.result_len[0])
    g_tokens = list(np.asarray(g.tokens)[0][:g_len])
    b_tokens = list(b.tokens[0][:b_len])
    assert b_tokens == g_tokens
    assert int(b.seek_delta[0]) == int(np.asarray(g.seek_delta)[0])
    assert bool(b.failed[0]) == bool(np.asarray(g.failed)[0])


def test_beam5_runs_and_scores(setup):
    rt, cross = setup
    b = _beam(rt, cross, 5)
    n = int(b.result_len[0])
    toks = b.tokens[0][:n]
    assert n >= 0
    # all recorded tokens are valid ids and timestamps where claimed
    assert all(0 <= t < rt.dims.n_vocab for t in toks)


def test_beam_avg_logprob_not_worse_than_greedy(setup):
    """Sum of log p over emitted tokens: beam-5 winner >= greedy sequence."""
    rt, cross = setup
    g = _greedy(rt, cross)
    b = _beam(rt, cross, 5)
    g_len = int(np.asarray(g.result_len)[0])
    b_len = int(b.result_len[0])
    if g_len == 0 or b_len == 0:
        pytest.skip("degenerate random-weight window")
    g_lp = np.sum(np.log(np.maximum(np.asarray(g.p)[0][:g_len], 1e-30))) / g_len
    b_lp = np.sum(np.log(np.maximum(b.p[0][:b_len], 1e-30))) / b_len
    assert b_lp >= g_lp - 1e-4


def test_beam_batched_utterances_match_single(setup):
    """U=2 utterances in one batched beam call == two U=1 calls."""
    import jax
    import numpy as np

    from whisper_tpu.api.params import FullParams, SamplingStrategy
    from whisper_tpu.runtime.beam import decode_window_beam

    rt, _ = setup
    rng = np.random.default_rng(77)
    mel = rng.standard_normal((2, 80, 2 * rt.dims.n_audio_ctx)).astype(np.float32)
    _, cross = rt.encode_window(mel)
    params = FullParams(strategy=SamplingStrategy.BEAM_SEARCH, beam_width=3)

    prompts = np.zeros((2, rt.prompt_capacity), np.int32)
    prompts[:, 0] = rt.ids.sot
    plens = np.ones((2,), np.int32)
    seeks = np.zeros((2,), np.int32)
    ends = np.full((2,), 10**6, np.int32)

    batched = decode_window_beam(rt, params, prompts, plens, cross, seeks, ends)

    for u in range(2):
        cross_u = jax.tree_util.tree_map(lambda a: a[:, u : u + 1], cross)
        single = decode_window_beam(
            rt, params, prompts[u : u + 1], plens[u : u + 1], cross_u,
            seeks[u : u + 1], ends[u : u + 1],
        )
        n_b = int(batched.result_len[u])
        n_s = int(single.result_len[0])
        assert n_b == n_s
        assert list(batched.tokens[u][:n_b]) == list(single.tokens[0][:n_s])
        assert int(batched.seek_delta[u]) == int(single.seek_delta[0])
        assert bool(batched.failed[u]) == bool(single.failed[0])


def test_beam_pallas_kernels_match_reference(setup):
    """Beam decode through the Pallas decode-attention kernels (interpret
    mode, grouped cross-KV lanes) must pick the same tokens as the einsum
    reference path."""
    import numpy as np

    from whisper_tpu.api.params import FullParams, SamplingStrategy
    from whisper_tpu.config import KernelConfig
    from whisper_tpu.runtime.beam import decode_window_beam
    from whisper_tpu.runtime.context import WhisperRuntime

    rt, cross = setup
    params = FullParams(strategy=SamplingStrategy.BEAM_SEARCH, beam_width=3)
    prompt = np.zeros((1, rt.prompt_capacity), np.int32)
    prompt[0, 0] = rt.ids.sot

    ref = decode_window_beam(rt, params, prompt, 1, cross, 0, 10**6)

    rt_k = WhisperRuntime(
        rt.params, rt.dims, rt.ids, compute_dtype=rt.compute_dtype,
        kernels=KernelConfig(flash_attention=True, interpret=True),
    )
    got = decode_window_beam(rt_k, params, prompt, 1, cross, 0, 10**6)

    n_r, n_g = int(ref.result_len[0]), int(got.result_len[0])
    assert n_r == n_g
    assert list(ref.tokens[0][:n_r]) == list(got.tokens[0][:n_g])
