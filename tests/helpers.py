"""Shared fixtures: synthetic GGML checkpoints with random weights.

With no pretrained weights in the image, numerics are validated by writing a
random-weight checkpoint in the exact GGML format, loading it through the
framework, and cross-checking against torch/transformers' Whisper
implementation run on the same weights (the analogue of the reference's
BUILD_BOTH_VERSIONS GGML-vs-GPU comparison strategy, SURVEY.md §4.1).
"""

from __future__ import annotations

import numpy as np

from whisper_tpu.ggml import MelFilters, write_checkpoint_file
from whisper_tpu.hparams import ModelDims

# A miniature-but-structurally-real config: full vocab (special-token ids are
# absolute, Vocabulary.h:27-36), tiny transformer dims, short audio context.
TINY_TEST_DIMS = ModelDims(
    n_vocab=51_864,
    n_audio_ctx=96,
    n_audio_state=64,
    n_audio_head=4,
    n_audio_layer=2,
    n_text_ctx=48,
    n_text_state=64,
    n_text_head=4,
    n_text_layer=2,
    n_mels=80,
    ftype=1,
)

MULTILINGUAL_TEST_DIMS = ModelDims(
    n_vocab=51_865,
    n_audio_ctx=96,
    n_audio_state=64,
    n_audio_head=4,
    n_audio_layer=2,
    n_text_ctx=48,
    n_text_state=64,
    n_text_head=4,
    n_text_layer=2,
    n_mels=80,
    ftype=1,
)


def make_vocab_words(n_vocab: int) -> list[bytes]:
    """Synthetic vocabulary: 256 single bytes, then filler words, with the
    GGML file storing only the non-synthesized prefix (like real checkpoints,
    which store up to token_beg and let the loader synthesize the rest)."""
    words = [bytes([b]) for b in range(256)]
    # common whitespace-prefixed words so tokenize() has multi-byte hits;
    # stop right before token_eot=50256 so the loader synthesizes every
    # special (exercises Vocabulary.cpp:123-141 equivalent).
    for i in range(256, 50_256):
        words.append(b" w%d" % i)
    return words[: min(n_vocab, 50_256)]


def mel_filterbank(n_mels: int = 80, n_fft: int = 400, sr: int = 16_000) -> np.ndarray:
    """Slaney-style mel filterbank [n_mels, n_fft//2+1], identical to what
    OpenAI whisper ships inside checkpoints (librosa.filters.mel defaults)."""
    from whisper_tpu.features.filters import mel_filter_bank

    return mel_filter_bank(n_mels=n_mels, n_fft=n_fft, sample_rate=sr)


def random_weights(dims: ModelDims, seed: int = 0) -> dict[str, np.ndarray]:
    """Random torch-layout weights for every whisper.cpp tensor name
    (name list per reference WhisperModel.cpp:63-160)."""
    rng = np.random.default_rng(seed)
    d = dims.n_audio_state
    scale = 1.0 / np.sqrt(d)

    def w(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    t: dict[str, np.ndarray] = {}
    t["encoder.positional_embedding"] = w(dims.n_audio_ctx, d)
    t["encoder.conv1.weight"] = w(d, dims.n_mels, 3)
    t["encoder.conv1.bias"] = w(d)
    t["encoder.conv2.weight"] = w(d, d, 3)
    t["encoder.conv2.bias"] = w(d)
    t["encoder.ln_post.weight"] = 1.0 + 0.1 * w(d)
    t["encoder.ln_post.bias"] = 0.1 * w(d)
    for i in range(dims.n_audio_layer):
        p = f"encoder.blocks.{i}."
        t[p + "attn_ln.weight"] = 1.0 + 0.1 * w(d)
        t[p + "attn_ln.bias"] = 0.1 * w(d)
        t[p + "attn.query.weight"] = w(d, d)
        t[p + "attn.query.bias"] = 0.1 * w(d)
        t[p + "attn.key.weight"] = w(d, d)
        t[p + "attn.value.weight"] = w(d, d)
        t[p + "attn.value.bias"] = 0.1 * w(d)
        t[p + "attn.out.weight"] = w(d, d)
        t[p + "attn.out.bias"] = 0.1 * w(d)
        t[p + "mlp_ln.weight"] = 1.0 + 0.1 * w(d)
        t[p + "mlp_ln.bias"] = 0.1 * w(d)
        t[p + "mlp.0.weight"] = w(4 * d, d)
        t[p + "mlp.0.bias"] = 0.1 * w(4 * d)
        t[p + "mlp.2.weight"] = w(d, 4 * d)
        t[p + "mlp.2.bias"] = 0.1 * w(d)
    t["decoder.positional_embedding"] = w(dims.n_text_ctx, d)
    t["decoder.token_embedding.weight"] = w(dims.n_vocab, d)
    t["decoder.ln.weight"] = 1.0 + 0.1 * w(d)
    t["decoder.ln.bias"] = 0.1 * w(d)
    for i in range(dims.n_text_layer):
        p = f"decoder.blocks.{i}."
        t[p + "attn_ln.weight"] = 1.0 + 0.1 * w(d)
        t[p + "attn_ln.bias"] = 0.1 * w(d)
        t[p + "attn.query.weight"] = w(d, d)
        t[p + "attn.query.bias"] = 0.1 * w(d)
        t[p + "attn.key.weight"] = w(d, d)
        t[p + "attn.value.weight"] = w(d, d)
        t[p + "attn.value.bias"] = 0.1 * w(d)
        t[p + "attn.out.weight"] = w(d, d)
        t[p + "attn.out.bias"] = 0.1 * w(d)
        t[p + "cross_attn_ln.weight"] = 1.0 + 0.1 * w(d)
        t[p + "cross_attn_ln.bias"] = 0.1 * w(d)
        t[p + "cross_attn.query.weight"] = w(d, d)
        t[p + "cross_attn.query.bias"] = 0.1 * w(d)
        t[p + "cross_attn.key.weight"] = w(d, d)
        t[p + "cross_attn.value.weight"] = w(d, d)
        t[p + "cross_attn.value.bias"] = 0.1 * w(d)
        t[p + "cross_attn.out.weight"] = w(d, d)
        t[p + "cross_attn.out.bias"] = 0.1 * w(d)
        t[p + "mlp_ln.weight"] = 1.0 + 0.1 * w(d)
        t[p + "mlp_ln.bias"] = 0.1 * w(d)
        t[p + "mlp.0.weight"] = w(4 * d, d)
        t[p + "mlp.0.bias"] = 0.1 * w(4 * d)
        t[p + "mlp.2.weight"] = w(d, 4 * d)
        t[p + "mlp.2.bias"] = 0.1 * w(d)
    return t


def make_random_checkpoint(
    path: str,
    dims: ModelDims = TINY_TEST_DIMS,
    seed: int = 0,
    use_f16: bool = True,
) -> dict[str, np.ndarray]:
    """Write a random GGML checkpoint; returns the f32 weights used."""
    weights = random_weights(dims, seed)
    filters = mel_filterbank(dims.n_mels)
    write_checkpoint_file(
        path,
        dims,
        MelFilters(filters.shape[0], filters.shape[1], filters),
        make_vocab_words(dims.n_vocab),
        weights,
        use_f16=use_f16,
    )
    return weights


def scripted_weights(dims: ModelDims, script: list[int], seed: int = 0,
                     emb_scale: float = 4.0, pos_scale: float = 50.0) -> dict[str, np.ndarray]:
    """Handcrafted weights that make the decoder a position -> token lookup
    table: with all attention/MLP weights zero, the hidden state at position
    ``i`` is ``tok_emb[seq[i]] + pos_emb[i]``; setting ``pos_emb[i]`` to a
    large multiple of ``tok_emb[script[i]]``'s direction makes the (tied)
    logits argmax at position ``i`` equal ``script[i]``. Greedy decode from
    ``[sot]`` then emits exactly ``script``, independent of the audio.

    Enables deterministic golden-output tests of the FULL pipeline (CLI,
    writers, windows, timestamps) without pretrained checkpoints — the
    analogue of the reference's golden SampleClips transcripts (SURVEY §4.6).

    Script tokens must obey the sampler rules (sampler.py): first token a
    timestamp in [beg, beg+100], text below token_beg, a timestamp before the
    final eot (else the window "fails").
    """
    assert len(script) + 1 <= dims.n_text_ctx, "script too long for n_text_ctx"
    rng = np.random.default_rng(seed)
    d = dims.n_audio_state

    emb = rng.standard_normal((dims.n_vocab, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb *= emb_scale
    u = emb / np.linalg.norm(emb, axis=1, keepdims=True)

    eot = 50_256 + (1 if dims.n_vocab >= 51_865 else 0)
    pos = np.zeros((dims.n_text_ctx, d), np.float32)
    for i in range(dims.n_text_ctx):
        target = script[i] if i < len(script) else eot
        pos[i] = pos_scale * u[target]

    t: dict[str, np.ndarray] = {}

    def zeros(*shape):
        return np.zeros(shape, np.float32)

    def ones(*shape):
        return np.ones(shape, np.float32)

    t["encoder.positional_embedding"] = zeros(dims.n_audio_ctx, d)
    t["encoder.conv1.weight"] = zeros(d, dims.n_mels, 3)
    t["encoder.conv1.bias"] = zeros(d)
    t["encoder.conv2.weight"] = zeros(d, d, 3)
    t["encoder.conv2.bias"] = zeros(d)
    t["encoder.ln_post.weight"] = ones(d)
    t["encoder.ln_post.bias"] = zeros(d)
    for i in range(dims.n_audio_layer):
        p = f"encoder.blocks.{i}."
        t[p + "attn_ln.weight"] = ones(d)
        t[p + "attn_ln.bias"] = zeros(d)
        t[p + "attn.query.weight"] = zeros(d, d)
        t[p + "attn.query.bias"] = zeros(d)
        t[p + "attn.key.weight"] = zeros(d, d)
        t[p + "attn.value.weight"] = zeros(d, d)
        t[p + "attn.value.bias"] = zeros(d)
        t[p + "attn.out.weight"] = zeros(d, d)
        t[p + "attn.out.bias"] = zeros(d)
        t[p + "mlp_ln.weight"] = ones(d)
        t[p + "mlp_ln.bias"] = zeros(d)
        t[p + "mlp.0.weight"] = zeros(4 * d, d)
        t[p + "mlp.0.bias"] = zeros(4 * d)
        t[p + "mlp.2.weight"] = zeros(d, 4 * d)
        t[p + "mlp.2.bias"] = zeros(d)
    t["decoder.positional_embedding"] = pos
    t["decoder.token_embedding.weight"] = emb
    t["decoder.ln.weight"] = ones(d)
    t["decoder.ln.bias"] = zeros(d)
    for i in range(dims.n_text_layer):
        p = f"decoder.blocks.{i}."
        t[p + "attn_ln.weight"] = ones(d)
        t[p + "attn_ln.bias"] = zeros(d)
        t[p + "attn.query.weight"] = zeros(d, d)
        t[p + "attn.query.bias"] = zeros(d)
        t[p + "attn.key.weight"] = zeros(d, d)
        t[p + "attn.value.weight"] = zeros(d, d)
        t[p + "attn.value.bias"] = zeros(d)
        t[p + "attn.out.weight"] = zeros(d, d)
        t[p + "attn.out.bias"] = zeros(d)
        t[p + "cross_attn_ln.weight"] = ones(d)
        t[p + "cross_attn_ln.bias"] = zeros(d)
        t[p + "cross_attn.query.weight"] = zeros(d, d)
        t[p + "cross_attn.query.bias"] = zeros(d)
        t[p + "cross_attn.key.weight"] = zeros(d, d)
        t[p + "cross_attn.value.weight"] = zeros(d, d)
        t[p + "cross_attn.value.bias"] = zeros(d)
        t[p + "cross_attn.out.weight"] = zeros(d, d)
        t[p + "cross_attn.out.bias"] = zeros(d)
        t[p + "mlp_ln.weight"] = ones(d)
        t[p + "mlp_ln.bias"] = zeros(d)
        t[p + "mlp.0.weight"] = zeros(4 * d, d)
        t[p + "mlp.0.bias"] = zeros(4 * d)
        t[p + "mlp.2.weight"] = zeros(d, 4 * d)
        t[p + "mlp.2.bias"] = zeros(d)
    return t


def make_scripted_checkpoint(
    path: str,
    script: list[int],
    dims: ModelDims = TINY_TEST_DIMS,
    seed: int = 0,
) -> dict[str, np.ndarray]:
    """Write a GGML checkpoint whose greedy decode always emits ``script``."""
    weights = scripted_weights(dims, script, seed)
    filters = mel_filterbank(dims.n_mels)
    write_checkpoint_file(
        path,
        dims,
        MelFilters(filters.shape[0], filters.shape[1], filters),
        make_vocab_words(dims.n_vocab),
        weights,
        use_f16=True,
    )
    return weights
