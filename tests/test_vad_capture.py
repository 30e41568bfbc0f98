"""VAD + capture state machine tests."""

import numpy as np

from whisper_tpu.audio.capture import CaptureParams, CaptureRunner, CaptureStatus
from whisper_tpu.audio.vad import VAD
from whisper_tpu.hparams import SAMPLE_RATE


def _speechy(n, seed=0):
    """Loud modulated tone: all three VAD features fire."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SAMPLE_RATE
    env = 0.6 + 0.4 * np.sin(2 * np.pi * 3 * t)
    sig = env * np.sin(2 * np.pi * 1200 * t) + 0.05 * rng.standard_normal(n)
    return sig.astype(np.float32)


def _silence(n, seed=1):
    """Quiet low-frequency hum: a realistic noise floor whose dominant
    frequency sits well below speech (white noise would randomize the
    dominant-frequency minimum and defeat the delta-F feature)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SAMPLE_RATE
    hum = 1e-3 * np.sin(2 * np.pi * 60 * t)
    return (hum + 1e-5 * rng.standard_normal(n)).astype(np.float32)


def test_vad_detects_speech_after_silence():
    vad = VAD()
    buf = np.concatenate([_silence(SAMPLE_RATE), _speechy(SAMPLE_RATE)])
    last = vad.detect(buf)
    assert last > SAMPLE_RATE  # speech detected in the second half


def test_vad_silence_only():
    vad = VAD()
    assert vad.detect(_silence(SAMPLE_RATE * 2)) == 0


def test_vad_incremental_matches_batch():
    batch = VAD()
    buf = np.concatenate([_silence(8000), _speechy(16000), _silence(8000)])
    want = batch.detect(buf)

    inc = VAD()
    got = 0
    for end in range(4000, len(buf) + 1, 4000):
        got = inc.detect(buf[:end])
    assert got == want


def test_capture_segments_and_transcribes():
    chunks = []

    def on_transcribe(pcm):
        chunks.append(len(pcm))

    statuses = []
    runner = CaptureRunner(
        on_transcribe,
        CaptureParams(min_duration=1.0, max_duration=2.0),
        on_status=statuses.append,
    )

    # 1 s noise-floor silence then 4 s speech, 100 ms chunks -> transcribe jobs
    # (the adaptive thresholds need an initial silence period, like any
    # Moattar-Homayounpour VAD)
    audio = np.concatenate([_silence(SAMPLE_RATE), _speechy(SAMPLE_RATE * 4)])
    source = [audio[i : i + 1600] for i in range(0, len(audio), 1600)]
    runner.run(source)

    assert chunks, "no transcribe jobs fired"
    assert sum(chunks) <= len(audio)
    assert any(s & CaptureStatus.VOICE for s in statuses)
    assert any(s & CaptureStatus.TRANSCRIBING for s in statuses)


def test_capture_drops_leading_silence():
    chunks = []
    runner = CaptureRunner(
        lambda pcm: chunks.append(len(pcm)),
        CaptureParams(min_duration=0.5, max_duration=1.0, drop_start_silence=0.25),
    )
    audio = _silence(SAMPLE_RATE * 3)
    source = [audio[i : i + 1600] for i in range(0, len(audio), 1600)]
    runner.run(source)
    assert chunks == [] or all(c < SAMPLE_RATE for c in chunks)
