"""Native library vs NumPy/device reference paths."""

import numpy as np
import pytest

from whisper_tpu import native


def test_fp16_conversion():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(10_000).astype(np.float16)
    got = native.fp16_to_f32(x)
    np.testing.assert_array_equal(got, x.astype(np.float32))
    # specials
    sp = np.array([0.0, -0.0, np.inf, -np.inf, 65504, 6e-8], np.float16)
    np.testing.assert_array_equal(native.fp16_to_f32(sp), sp.astype(np.float32))


def test_signal_energy_matches_python():
    from whisper_tpu.api.timestamps import compute_signal_energy

    rng = np.random.default_rng(1)
    pcm = rng.standard_normal(50_000).astype(np.float32)
    got = native.signal_energy(pcm, 32)
    want = compute_signal_energy(pcm, 32)
    assert np.max(np.abs(got - want)) < 1e-4


@pytest.mark.parametrize("mode", ["openai", "reference"])
def test_log_mel_matches_device(mode):
    from whisper_tpu.features import LogMelSpectrogram, mel_filter_bank

    rng = np.random.default_rng(2)
    pcm = (0.3 * rng.standard_normal(16_000 * 3)).astype(np.float32)
    filters = mel_filter_bank()

    dev = np.asarray(LogMelSpectrogram(filters, mode=mode)(pcm, normalize=False))
    host = native.log_mel_raw(pcm, filters, mode=mode)
    assert host.shape == dev.shape
    assert np.max(np.abs(host - dev)) < 2e-3
