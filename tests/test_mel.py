"""Mel front-end golden tests vs transformers' WhisperFeatureExtractor.

The extractor implements OpenAI whisper's exact log-mel (reflect-pad,
center=True); our "openai" mode must match it to float tolerance. The
"reference" mode reproduces whisper.cpp/Const-me framing (SURVEY.md §2.4).
"""

import numpy as np
import pytest

from whisper_tpu.features import LogMelSpectrogram, mel_filter_bank


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(42)
    t = np.arange(16_000 * 30) / 16_000.0
    sig = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(t.shape)
    return sig.astype(np.float32)


def test_filterbank_matches_transformers():
    from transformers.audio_utils import mel_filter_bank as hf_mel

    ours = mel_filter_bank(n_mels=80, n_fft=400, sample_rate=16_000)
    theirs = hf_mel(
        num_frequency_bins=201,
        num_mel_filters=80,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16_000,
        norm="slaney",
        mel_scale="slaney",
    ).T  # transformers returns [n_bins, n_mels]
    np.testing.assert_allclose(ours, theirs, atol=1e-7)


def test_log_mel_matches_transformers(audio):
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor()
    ref = fe(audio, sampling_rate=16_000, return_tensors="np")["input_features"][0]

    mel = LogMelSpectrogram(mel_filter_bank(), mode="openai")
    ours = np.asarray(mel(audio))
    assert ours.shape == ref.shape == (80, 3000)
    assert np.max(np.abs(ours - ref)) < 2e-4


def test_reference_mode_shapes(audio):
    mel = LogMelSpectrogram(mel_filter_bank(), mode="reference")
    out = np.asarray(mel(audio))
    assert out.shape == (80, 3000)
    assert np.isfinite(out).all()
    # normalized range: (max+4)/4 >= out > (max-4)/4
    assert out.max() <= (out.max() * 4 - 4 + 8) / 4 + 1  # sanity only


def test_normalization_masking():
    from whisper_tpu.features.mel import normalize_log_mel

    lm = np.zeros((4, 10), np.float32)
    lm[:, :5] = -2.0
    out = np.asarray(normalize_log_mel(lm, valid_frames=5))
    assert (out[:, 5:] == 0).all()
    assert (out[:, :5] != 0).all()


def test_streaming_openai_matches_batch(audio):
    """Openai-framed streaming (reflect prefix/suffix around the causal
    engine) must reproduce the batch front-end on irregular chunk sizes."""
    from whisper_tpu.features.stream import MelStreamer

    filters = mel_filter_bank(80)
    batch = np.asarray(LogMelSpectrogram(filters, mode="openai")(audio))

    clip = audio[: 16_000 * 7 + 123]
    batch_clip = np.asarray(LogMelSpectrogram(filters, mode="openai")(clip))

    for sig, expect in ((audio, batch), (clip, batch_clip)):
        streamer = MelStreamer(LogMelSpectrogram(filters, mode="openai"))
        rng = np.random.default_rng(7)
        i = 0
        while i < len(sig):
            n = int(rng.integers(37, 5000))
            streamer.append(sig[i : i + n])
            i += n
        got = streamer.finalize()
        assert got.shape == expect.shape
        # bit-exact: the streamer normalizes in f32 like the batch path
        np.testing.assert_array_equal(got, expect)


def test_streaming_openai_tiny_stream():
    """Streams shorter than the reflect pad still produce framed output."""
    from whisper_tpu.features.stream import MelStreamer

    filters = mel_filter_bank(80)
    streamer = MelStreamer(LogMelSpectrogram(filters, mode="openai"))
    rng = np.random.default_rng(3)
    streamer.append(rng.standard_normal(190).astype(np.float32) * 0.1)
    mel = streamer.finalize()
    assert mel.shape == (80, 190 // 160)
    assert np.isfinite(mel).all()
