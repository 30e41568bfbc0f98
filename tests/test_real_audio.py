"""Real-audio plumbing tests on the reference's jfk.wav sample clip.

(No pretrained weights exist in this image, so transcription content can't
be golden-tested — but decode, resample, mel, energy, and VAD must behave
sanely on real speech.)
"""

import os

import numpy as np
import pytest

JFK = "/root/reference/SampleClips/jfk.wav"

pytestmark = pytest.mark.skipif(not os.path.exists(JFK), reason="sample clip missing")


@pytest.fixture(scope="module")
def jfk():
    from whisper_tpu.audio import load_audio_file

    return load_audio_file(JFK)


def test_load_jfk(jfk):
    assert 10.0 < jfk.duration_s < 12.0  # the clip is 11 s
    assert jfk.mono.dtype == np.float32
    assert np.abs(jfk.mono).max() <= 1.01
    assert np.abs(jfk.mono).max() > 0.05  # real signal


def test_mel_on_jfk(jfk):
    from whisper_tpu.features import LogMelSpectrogram, mel_filter_bank

    mel = LogMelSpectrogram(mel_filter_bank())(jfk.mono)
    m = np.asarray(mel)
    assert m.shape[0] == 80
    assert abs(m.shape[1] - jfk.duration_s * 100) < 5
    assert np.isfinite(m).all()
    # speech has spectral variation; silence-only would be constant
    assert m.std() > 0.05


def test_native_mel_matches_device_on_jfk(jfk):
    from whisper_tpu import native
    from whisper_tpu.features import LogMelSpectrogram, mel_filter_bank

    filters = mel_filter_bank()
    dev = np.asarray(LogMelSpectrogram(filters)(jfk.mono, normalize=False))
    host = native.log_mel_raw(jfk.mono, filters, mode="openai")
    assert np.max(np.abs(dev - host)) < 1e-2  # f32 ordering on near-floor bins


def test_vad_finds_speech_in_jfk(jfk):
    from whisper_tpu.audio.vad import VAD

    last = VAD().detect(jfk.mono)
    # speech should be detected well into the clip
    assert last > len(jfk.mono) // 2


def test_signal_energy_jfk(jfk):
    from whisper_tpu.api.timestamps import compute_signal_energy

    e = compute_signal_energy(jfk.mono)
    assert e.shape == jfk.mono.shape
    assert e.max() > 10 * np.median(e)  # bursts of speech over pauses


def test_streamed_mel_matches_batch_reference_mode(jfk):
    from whisper_tpu.audio.load import ChunkedReader
    from whisper_tpu.features import LogMelSpectrogram, mel_filter_bank
    from whisper_tpu.features.stream import MelStreamer

    filters = mel_filter_bank()
    batch = np.asarray(LogMelSpectrogram(filters, mode="reference")(jfk.mono))

    streamer = MelStreamer(LogMelSpectrogram(filters, mode="reference"))
    for chunk in ChunkedReader(jfk.mono):
        streamer.append(chunk)
    streamed = streamer.finalize()

    n = min(batch.shape[1], streamed.shape[1]) - 5  # ignore tail padding frames
    diff = np.abs(batch[:, :n] - streamed[:, :n])
    assert diff.max() < 1e-3
