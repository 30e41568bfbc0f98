"""Log-mel spectrogram front-end, on-device (jnp, MXU-friendly).

Replaces the reference's threaded CPU FFT pipeline
(Whisper/Whisper/melSpectrogram.cpp, Spectrogram.cpp:64-122). Instead of a
radix-2 FFT, the 400-point real DFT is expressed as two dense matmuls with
precomputed cos/sin bases — [n_frames, 400] @ [400, 201] runs on the MXU and
is far faster on TPU than an FFT ladder at this tiny transform size.

Two framing modes:
  - "openai"    — reflect-pad n_fft//2 on both sides (center=True), the exact
                  semantics of OpenAI whisper / transformers'
                  WhisperFeatureExtractor; frame i is centered at i*hop.
  - "reference" — whisper.cpp/Const-me semantics: no centering, frame i
                  covers [i*hop, i*hop + n_fft) zero-padded at the clip end,
                  and the power spectrum "fold" doubles bins 1..n_fft/2-1
                  (melSpectrogram.cpp:355-366).
  - "causal"    — reference framing WITHOUT the power fold: the building
                  block the streaming front-end uses to reproduce "openai"
                  framing incrementally (the caller supplies the reflect
                  padding, see features/stream.py).

Both end with: mel = filters @ power, log10(max(mel, 1e-10)),
clamp to global_max - 8, then (x + 4) / 4 (Spectrogram.cpp:90-103).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.hparams import HOP_LENGTH, N_FFT


def _hann_window(n_fft: int) -> np.ndarray:
    # Periodic Hann, same as the reference (melSpectrogram.cpp:12) and torch.
    i = np.arange(n_fft)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / n_fft))).astype(np.float32)


def _dft_bases(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT bases: returns (cos, -sin) matrices of shape [n_fft, n_bins]."""
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    theta = 2.0 * np.pi * n * k / n_fft
    return np.cos(theta).astype(np.float32), (-np.sin(theta)).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "mode"))
def _mel_power(
    audio: jax.Array,
    window: jax.Array,
    cos_b: jax.Array,
    sin_b: jax.Array,
    filters: jax.Array,
    n_fft: int,
    hop: int,
    mode: str,
) -> jax.Array:
    """audio [n_samples] -> unnormalized log10-mel [n_mels, n_frames]."""
    n_samples = audio.shape[0]
    if mode == "openai":
        audio = jnp.pad(audio, (n_fft // 2, n_fft // 2), mode="reflect")
        n_frames = n_samples // hop  # matches torch.stft center=True, last frame dropped
    elif mode in ("reference", "causal"):
        # zero-pad the tail so every frame has n_fft samples
        audio = jnp.pad(audio, (0, n_fft))
        n_frames = n_samples // hop
    else:
        raise ValueError(f"unknown mel mode {mode!r}")

    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    frames = audio[idx] * window[None, :]                       # [F, n_fft]

    # HIGHEST precision: on TPU the default f32 matmul path rounds through
    # bf16, which is too coarse for a DFT basis; this forces 6-pass f32.
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, cos_b, precision=hi, preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_b, precision=hi, preferred_element_type=jnp.float32)
    power = re * re + im * im                                   # [F, n_bins]
    if mode == "reference":
        # conjugate-symmetric fold (melSpectrogram.cpp:355-366): doubles
        # every bin except DC and Nyquist
        n_bins = n_fft // 2 + 1
        scale = jnp.ones((n_bins,), power.dtype).at[1 : n_bins - 1].set(2.0)
        power = power * scale[None, :]

    mel = jnp.dot(power, filters.T, precision=hi, preferred_element_type=jnp.float32)
    return jnp.log10(jnp.maximum(mel, 1e-10)).T                 # [n_mels, F]


def normalize_log_mel(log_mel: jax.Array, valid_frames: jax.Array | None = None):
    """Whisper dynamic-range normalization (Spectrogram.cpp:90-103):
    clamp to global max - 8, then (x + 4) / 4. Frames at or past
    ``valid_frames`` are zeroed, matching the reference's zero-padded mel
    window semantics (MelInputTensor.cpp:8-64)."""
    mmax = jnp.max(log_mel) - 8.0
    out = (jnp.maximum(log_mel, mmax) + 4.0) / 4.0
    if valid_frames is not None:
        frame_idx = jnp.arange(log_mel.shape[-1])
        out = jnp.where(frame_idx[None, :] < valid_frames, out, 0.0)
    return out


class LogMelSpectrogram:
    """Holds the filterbank + DFT bases as device constants.

    ``filters``: [n_mels, n_fft//2+1] (from the GGML checkpoint, or
    ``mel_filter_bank()``).
    """

    def __init__(
        self,
        filters: np.ndarray,
        n_fft: int = N_FFT,
        hop: int = HOP_LENGTH,
        mode: str = "openai",
    ):
        self.n_mels = int(filters.shape[0])
        self.n_fft = n_fft
        self.hop = hop
        self.mode = mode
        self.filters = jnp.asarray(filters, jnp.float32)
        self.window = jnp.asarray(_hann_window(n_fft))
        cos_b, sin_b = _dft_bases(n_fft)
        self.cos_b = jnp.asarray(cos_b)
        self.sin_b = jnp.asarray(sin_b)

    def __call__(self, audio, normalize: bool = True) -> jax.Array:
        """audio: [n_samples] float32 at 16 kHz -> [n_mels, n_frames]."""
        audio = jnp.asarray(audio, jnp.float32)
        lm = _mel_power(
            audio, self.window, self.cos_b, self.sin_b, self.filters,
            self.n_fft, self.hop, self.mode,
        )
        return normalize_log_mel(lm) if normalize else lm


def log_mel_spectrogram(audio, filters, mode: str = "openai", normalize: bool = True):
    """One-shot helper (constructs bases each call — prefer LogMelSpectrogram)."""
    return LogMelSpectrogram(np.asarray(filters), mode=mode)(audio, normalize)
