"""End-to-end run_full smoke tests on a synthetic checkpoint.

Random weights produce garbage text, but the full pipeline must run: mel ->
encode -> on-device decode -> segment assembly -> result, with sane
structure (monotonic segment times, token bookkeeping, callbacks firing).
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from tests.helpers import TINY_TEST_DIMS, make_random_checkpoint
    from whisper_tpu.api.model import Model
    from whisper_tpu.model.params import DtypePolicy

    path = str(tmp_path_factory.mktemp("e2e") / "tiny.bin")
    make_random_checkpoint(path, TINY_TEST_DIMS, seed=5)
    import jax.numpy as jnp

    return Model(path, policy=DtypePolicy.f32())


def test_run_full_smoke(model):
    from whisper_tpu.api.params import Flags, full_default_params

    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal(16_000 * 10)).astype(np.float32)

    progress = []
    segments_seen = []
    params = full_default_params()
    params.flags = Flags.NONE
    params.progress_callback = progress.append
    params.new_segment_callback = lambda ctx, n_new: segments_seen.append(n_new)

    ctx = model.create_context()
    result = ctx.run_full(params, audio)

    assert progress and progress[-1] == 1.0
    assert len(result.segments) == len(ctx.result_all)
    for seg in result.segments:
        assert seg.t1 >= seg.t0 >= 0
        assert isinstance(seg.text, str)
        for tok in seg.tokens:
            assert 0 <= tok.id < model.dims.n_vocab
    if result.segments:
        assert len(segments_seen) >= 1


def test_run_full_short_audio_skipped(model):
    """Clips under 1 s return empty (ContextImpl.cpp:470-473)."""
    audio = np.zeros(8_000, np.float32)
    ctx = model.create_context()
    result = ctx.run_full(None, audio)
    assert len(result.segments) == 0


def test_run_full_stereo_diarization(model):
    from whisper_tpu.api.params import Flags, full_default_params

    rng = np.random.default_rng(1)
    left = (0.2 * rng.standard_normal(16_000 * 6)).astype(np.float32)
    right = (0.01 * rng.standard_normal(16_000 * 6)).astype(np.float32)
    stereo = np.stack([left, right])

    params = full_default_params()
    params.flags = Flags.NONE
    ctx = model.create_context()
    result = ctx.run_full(params, stereo)
    from whisper_tpu.api.result import Speaker

    for seg in result.segments:
        assert seg.speaker in (Speaker.LEFT, Speaker.RIGHT, Speaker.UNSURE)


def test_padded_prompt_matches_exact(model):
    """Left-padded prompt ingest must give the same last-token logits as an
    exact-length prompt (validates the attn_start masking + pos offsets)."""
    import jax.numpy as jnp

    from whisper_tpu.model.decoder import decode_step, init_self_kv

    rt = model.runtime
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((1, 80, 2 * model.dims.n_audio_ctx)).astype(np.float32)
    _, cross = rt.encode_window(mel)

    prompt = [rt.ids.sot, 100, 200]
    kv = init_self_kv(model.dims, 1, dtype=jnp.float32)
    exact, _ = decode_step(
        rt.params, model.dims, jnp.asarray([prompt], jnp.int32),
        jnp.zeros((1,), jnp.int32), kv, cross, compute_dtype=jnp.float32,
    )

    cap = rt.prompt_capacity
    padded = np.zeros((1, cap), np.int32)
    padded[0, cap - len(prompt):] = prompt
    lead = cap - len(prompt)
    kv = init_self_kv(model.dims, 1, dtype=jnp.float32)
    pad_logits, _ = decode_step(
        rt.params, model.dims, jnp.asarray(padded),
        jnp.asarray([-lead], jnp.int32), kv, cross,
        write_pos=0, attn_start=jnp.asarray([lead], jnp.int32),
        compute_dtype=jnp.float32,
    )
    assert np.max(np.abs(np.asarray(exact) - np.asarray(pad_logits))) < 1e-4
