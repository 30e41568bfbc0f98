"""Batched scheduler: N utterances together must equal N sequential runs."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from tests.helpers import TINY_TEST_DIMS, make_random_checkpoint
    from whisper_tpu.api.model import Model
    from whisper_tpu.model.params import DtypePolicy

    path = str(tmp_path_factory.mktemp("bt") / "tiny.bin")
    make_random_checkpoint(path, TINY_TEST_DIMS, seed=40)
    return Model(path, policy=DtypePolicy.f32())


def _clips(n, seconds=6):
    rng = np.random.default_rng(99)
    return [
        (0.1 * rng.standard_normal(16_000 * seconds)).astype(np.float32)
        for _ in range(n)
    ]


def test_batch_matches_sequential(model):
    from whisper_tpu.api.params import Flags, full_default_params
    from whisper_tpu.runtime.batch import BatchTranscriber

    clips = _clips(3)
    params = full_default_params()
    params.flags = Flags.NONE

    seq = []
    for c in clips:
        ctx = model.create_context()
        seq.append(ctx.run_full(params, c))

    bt = BatchTranscriber(model, batch=3)
    got = bt.transcribe(clips, params)

    assert len(got) == len(seq)
    for a, b in zip(got, seq):
        assert [s.text for s in a.segments] == [s.text for s in b.segments]
        assert [(s.t0, s.t1) for s in a.segments] == [(s.t0, s.t1) for s in b.segments]


def test_batch_mixed_lengths_and_refill(model):
    from whisper_tpu.api.params import Flags, full_default_params
    from whisper_tpu.runtime.batch import BatchTranscriber

    rng = np.random.default_rng(7)
    clips = [
        (0.1 * rng.standard_normal(16_000 * s)).astype(np.float32)
        for s in (4, 9, 2, 6, 5)
    ]
    params = full_default_params()
    params.flags = Flags.NONE

    bt = BatchTranscriber(model, batch=2)  # forces refill rounds
    got = bt.transcribe(clips, params)
    assert len(got) == 5

    # sequential comparison for two of them
    for idx in (0, 3):
        ctx = model.create_context()
        want = ctx.run_full(params, clips[idx])
        assert [s.text for s in got[idx].segments] == [s.text for s in want.segments]


def test_batch_short_clip_empty(model):
    from whisper_tpu.runtime.batch import BatchTranscriber

    clips = _clips(1, seconds=6) + [np.zeros(4_000, np.float32)]
    bt = BatchTranscriber(model, batch=2)
    got = bt.transcribe(clips)
    assert len(got) == 2
    assert len(got[1].segments) == 0


def test_batch_single_segment_matches_sequential(model):
    from whisper_tpu.api.params import Flags, full_default_params
    from whisper_tpu.runtime.batch import BatchTranscriber

    clips = _clips(2, seconds=4)
    params = full_default_params()
    params.flags = Flags.SINGLE_SEGMENT

    seq = []
    for c in clips:
        ctx = model.create_context()
        seq.append(ctx.run_full(params, c))

    got = BatchTranscriber(model, batch=2).transcribe(clips, params)
    for a, b in zip(got, seq):
        assert len(a.segments) == len(b.segments) <= 1
        assert [s.text for s in a.segments] == [s.text for s in b.segments]
        assert [(s.t0, s.t1) for s in a.segments] == [(s.t0, s.t1) for s in b.segments]


def test_batch_beam_matches_sequential(model):
    """Beam search composes with batching: utterance-major [B*beam] lanes."""
    from whisper_tpu.api.params import Flags, FullParams, SamplingStrategy
    from whisper_tpu.runtime.batch import BatchTranscriber

    clips = _clips(3, seconds=4)
    params = FullParams(strategy=SamplingStrategy.BEAM_SEARCH, beam_width=3)
    params.flags = Flags.NONE

    seq = []
    for c in clips:
        ctx = model.create_context()
        seq.append(ctx.run_full(params, c))

    got = BatchTranscriber(model, batch=2).transcribe(clips, params)
    assert len(got) == len(seq)
    for a, b in zip(got, seq):
        assert [s.text for s in a.segments] == [s.text for s in b.segments]
        assert [(s.t0, s.t1) for s in a.segments] == [(s.t0, s.t1) for s in b.segments]


def test_batch_token_timestamps_match_sequential(model):
    """TOKEN_TIMESTAMPS must not silently no-op in the batched scheduler:
    per-lane energy is computed and token times match run_full exactly."""
    from whisper_tpu.api.params import Flags, full_default_params
    from whisper_tpu.runtime.batch import BatchTranscriber

    clips = _clips(2, seconds=4)
    params = full_default_params()
    params.flags = Flags.TOKEN_TIMESTAMPS

    seq = []
    for c in clips:
        ctx = model.create_context()
        seq.append(ctx.run_full(params, c))

    got = BatchTranscriber(model, batch=2).transcribe(clips, params)
    for a, b in zip(got, seq):
        ta = [(t.t0, t.t1) for s in a.segments for t in s.tokens]
        tb = [(t.t0, t.t1) for s in b.segments for t in s.tokens]
        assert ta == tb
        assert any(t0 >= 0 for t0, _ in ta) or not ta


def test_batch_progress_callback_fires(model):
    from whisper_tpu.api.params import Flags, full_default_params
    from whisper_tpu.runtime.batch import BatchTranscriber

    clips = _clips(2, seconds=4)
    seen = []
    params = full_default_params()
    params.flags = Flags.NONE
    params.progress_callback = seen.append

    BatchTranscriber(model, batch=2).transcribe(clips, params)
    assert seen and seen[-1] == 1.0 and all(0.0 <= f <= 1.0 for f in seen)
