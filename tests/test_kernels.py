"""Pallas kernel diffs vs the jnp reference path (the computeDiff analogue,
reference testUtils.h:26-61 / tensorOpsTests.cpp). CPU interpreter mode."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def jnp():
    import jax.numpy as jnp

    return jnp


def test_flash_attention_matches_reference(jnp):
    from whisper_tpu.kernels.attention import flash_attention
    from whisper_tpu.model.layers import attention

    rng = np.random.default_rng(0)
    b, tq, tk, h, dh = 2, 96, 96, 4, 64
    q = rng.standard_normal((b, tq, h, dh)).astype(np.float32) * 0.3
    k = rng.standard_normal((b, tk, h, dh)).astype(np.float32) * 0.3
    v = rng.standard_normal((b, tk, h, dh)).astype(np.float32)

    ref = np.asarray(attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               compute_dtype=jnp.float32))
    got = np.asarray(
        flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        q_blk=32, interpret=True)
    )
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 1e-5


def test_flash_attention_unaligned_lengths(jnp):
    """Tq=1500-like non-multiple-of-block lengths must pad+mask correctly."""
    from whisper_tpu.kernels.attention import flash_attention
    from whisper_tpu.model.layers import attention

    rng = np.random.default_rng(1)
    b, tq, tk, h, dh = 1, 75, 150, 2, 64
    q = rng.standard_normal((b, tq, h, dh)).astype(np.float32) * 0.3
    k = rng.standard_normal((b, tk, h, dh)).astype(np.float32) * 0.3
    v = rng.standard_normal((b, tk, h, dh)).astype(np.float32)

    ref = np.asarray(attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               compute_dtype=jnp.float32))
    got = np.asarray(
        flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        q_blk=32, interpret=True)
    )
    assert np.max(np.abs(got - ref)) < 1e-5


def test_encoder_with_pallas_matches_reference_path(jnp):
    """Whole encoder with flash_attention=True (interpret) vs jnp path."""
    from tests.helpers import TINY_TEST_DIMS, make_random_checkpoint
    from whisper_tpu.config import KernelConfig
    from whisper_tpu.ggml import load_checkpoint
    from whisper_tpu.model.encoder import encode
    from whisper_tpu.model.params import DtypePolicy, params_from_checkpoint

    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "m.bin")
        make_random_checkpoint(path, TINY_TEST_DIMS, seed=9)
        cp = load_checkpoint(path)
    params = params_from_checkpoint(cp, DtypePolicy.f32())

    rng = np.random.default_rng(3)
    mel = rng.standard_normal((1, 80, 2 * cp.dims.n_audio_ctx)).astype(np.float32)

    ref = np.asarray(
        encode(params, cp.dims, jnp.asarray(mel), compute_dtype=jnp.float32,
               kernels=KernelConfig.reference())
    )
    got = np.asarray(
        encode(params, cp.dims, jnp.asarray(mel), compute_dtype=jnp.float32,
               kernels=KernelConfig(flash_attention=True, interpret=True))
    )
    assert np.max(np.abs(got - ref)) < 1e-4


def test_decode_attention_matches_einsum(jnp):
    from whisper_tpu.kernels.decode_attention import decode_attention

    rng = np.random.default_rng(5)
    B, H, Dh, S = 2, 4, 64, 150
    q = rng.standard_normal((B, H, Dh)).astype(np.float32) * 0.3
    k = rng.standard_normal((B, S, H, Dh)).astype(np.float32) * 0.3
    v = rng.standard_normal((B, S, H, Dh)).astype(np.float32)

    def ref(q, k, v, valid=None):
        s = np.einsum("bhd,bshd->bhs", q, k)
        if valid is not None:
            for b in range(B):
                s[b, :, valid[b]:] = -np.inf
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        return np.einsum("bhs,bshd->bhd", p, v)

    kt = np.ascontiguousarray(k.transpose(0, 2, 3, 1))
    vt = np.ascontiguousarray(v.transpose(0, 2, 3, 1))

    got = np.asarray(decode_attention(
        jnp.asarray(q), jnp.asarray(kt), jnp.asarray(vt), interpret=True))
    assert np.max(np.abs(got - ref(q, k, v))) < 1e-5

    valid = np.array([37, 150], np.int32)
    got = np.asarray(decode_attention(
        jnp.asarray(q), jnp.asarray(kt), jnp.asarray(vt),
        jnp.asarray(valid), interpret=True))
    assert np.max(np.abs(got - ref(q, k, v, valid))) < 1e-5


def test_decode_attention_start_mask(jnp):
    """Per-lane [start, valid) key intervals (left-padded prompt cache)."""
    from whisper_tpu.kernels.decode_attention import decode_attention_hd

    rng = np.random.default_rng(6)
    B, H, Dh, S = 3, 4, 64, 150
    HD = H * Dh
    q = rng.standard_normal((B, HD, 1)).astype(np.float32) * 0.3
    kt = rng.standard_normal((B, HD, S)).astype(np.float32) * 0.3
    vt = rng.standard_normal((B, HD, S)).astype(np.float32)
    start = np.array([0, 12, 149], np.int32)
    valid = np.array([37, 150, 150], np.int32)

    def ref():
        out = np.zeros((B, HD, 1), np.float32)
        for b in range(B):
            k4 = kt[b].reshape(H, Dh, S)
            v4 = vt[b].reshape(H, Dh, S)
            q4 = q[b].reshape(H, Dh, 1)
            s = np.einsum("hds,hdo->hs", k4, q4)
            s[:, : start[b]] = -np.inf
            s[:, valid[b]:] = -np.inf
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            out[b] = np.einsum("hs,hds->hd", p, v4).reshape(HD, 1)
        return out

    got = np.asarray(decode_attention_hd(
        jnp.asarray(q), jnp.asarray(kt), jnp.asarray(vt), H,
        valid_len=jnp.asarray(valid), start=jnp.asarray(start), interpret=True))
    assert np.max(np.abs(got - ref())) < 1e-5


def test_quantize_cols_roundtrip(jnp):
    from whisper_tpu.kernels.quant import dequantize, quantize_cols

    rng = np.random.default_rng(7)
    x = (rng.standard_normal((2, 64, 10)) * 3).astype(np.float32)
    q, s = quantize_cols(jnp.asarray(x), axis=-2)
    back = np.asarray(dequantize(q, s, jnp.float32))
    # per-column symmetric int8: error bounded by half a quantization step
    amax = np.abs(x).max(axis=-2, keepdims=True)
    assert np.all(np.abs(back - x) <= amax / 127.0 * 0.5 + 1e-7)


def test_decode_attention_int8_matches_dequantized(jnp):
    """Kernel with int8 K/V + per-column scales == einsum on dequantized."""
    from whisper_tpu.kernels.decode_attention import decode_attention_hd
    from whisper_tpu.kernels.quant import dequantize, quantize_cols

    rng = np.random.default_rng(8)
    B, H, Dh, S = 2, 4, 64, 200
    HD = H * Dh
    q = rng.standard_normal((B, HD, 1)).astype(np.float32) * 0.3
    kt = rng.standard_normal((B, HD, S)).astype(np.float32) * 0.5
    vt = rng.standard_normal((B, HD, S)).astype(np.float32)

    k8, ks = quantize_cols(jnp.asarray(kt), axis=-2)
    v8, vs = quantize_cols(jnp.asarray(vt), axis=-2)
    kd = np.asarray(dequantize(k8, ks, jnp.float32))
    vd = np.asarray(dequantize(v8, vs, jnp.float32))

    # reference: per-head softmax over dequantized values
    k4 = kd.reshape(B, H, Dh, S)
    v4 = vd.reshape(B, H, Dh, S)
    q4 = q.reshape(B, H, Dh, 1)
    sc = np.einsum("bhds,bhdo->bhs", k4, q4)
    p = np.exp(sc - sc.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bhs,bhds->bhd", p, v4).reshape(B, HD, 1)

    got = np.asarray(decode_attention_hd(
        jnp.asarray(q), k8, v8, H, k_scale=ks, v_scale=vs, interpret=True))
    assert np.max(np.abs(got - want)) < 1e-5


def test_decode_window_int8_kv_matches_reference_tokens(jnp):
    """Full window loop with int8 self+cross KV must produce the same tokens
    as the f32 einsum path on a scripted checkpoint (greedy margins are wide,
    so <=1/127-step quantization noise must not flip any token)."""
    import tempfile, os

    from tests.helpers import (
        TINY_TEST_DIMS, make_scripted_checkpoint, make_vocab_words,
    )
    from whisper_tpu.config import KernelConfig
    from whisper_tpu.ggml import load_checkpoint
    from whisper_tpu.model.params import DtypePolicy, params_from_checkpoint
    from whisper_tpu.runtime.context import WhisperRuntime
    from whisper_tpu.runtime.sampler import SpecialIds
    from whisper_tpu.vocab import Vocabulary

    beg, eot = 50_363, 50_256
    script = [beg, 32, 104, 105, 32, 116, 112, 117, beg + 96, eot]
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "m.bin")
        make_scripted_checkpoint(path, script)
        cp = load_checkpoint(path)
    params = params_from_checkpoint(cp, DtypePolicy.f32())
    vocab = Vocabulary(make_vocab_words(cp.dims.n_vocab), cp.dims.n_vocab)
    ids = SpecialIds.from_vocab(vocab)

    rng = np.random.default_rng(21)
    mel = rng.standard_normal((1, 80, 2 * cp.dims.n_audio_ctx)).astype(np.float32)

    results = {}
    for name, kcfg in (
        ("reference", KernelConfig.reference()),
        ("int8", KernelConfig(flash_attention=True, interpret=True, kv_int8=True)),
    ):
        rt = WhisperRuntime(params, cp.dims, ids, compute_dtype=jnp.float32, kernels=kcfg)
        _, cross = rt.encode_window(mel)
        padded = np.zeros((1, rt.prompt_capacity), np.int32)
        padded[0, 0] = ids.sot
        res = rt.run_window(
            padded, np.ones((1,), np.int32), cross,
            np.zeros((1,), np.int32), np.full((1,), 10**6, np.int32),
        )
        results[name] = (
            list(np.asarray(res.tokens)[0][: int(np.asarray(res.result_len)[0])]),
            bool(np.asarray(res.failed)[0]),
        )
    assert results["reference"] == results["int8"]
    assert results["int8"][0] == script[:-1]  # script minus the EOT


def test_decode_window_with_pallas_cross_matches_einsum_path(jnp):
    """Full on-device window loop: pallas cross-attention (interpret) must
    produce identical tokens to the einsum path."""
    import tempfile, os

    from tests.helpers import TINY_TEST_DIMS, make_random_checkpoint, make_vocab_words
    from whisper_tpu.config import KernelConfig
    from whisper_tpu.ggml import load_checkpoint
    from whisper_tpu.model.params import DtypePolicy, params_from_checkpoint
    from whisper_tpu.runtime.context import WhisperRuntime
    from whisper_tpu.runtime.sampler import SpecialIds
    from whisper_tpu.vocab import Vocabulary

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "m.bin")
        make_random_checkpoint(path, TINY_TEST_DIMS, seed=13)
        cp = load_checkpoint(path)
    params = params_from_checkpoint(cp, DtypePolicy.f32())
    vocab = Vocabulary(make_vocab_words(cp.dims.n_vocab), cp.dims.n_vocab)
    ids = SpecialIds.from_vocab(vocab)

    rng = np.random.default_rng(17)
    mel = rng.standard_normal((1, 80, 2 * cp.dims.n_audio_ctx)).astype(np.float32)

    results = {}
    for name, kcfg in (
        ("einsum", KernelConfig.reference()),
        ("pallas", KernelConfig(flash_attention=True, interpret=True)),
    ):
        rt = WhisperRuntime(params, cp.dims, ids, compute_dtype=jnp.float32, kernels=kcfg)
        _, cross = rt.encode_window(mel)
        padded = np.zeros((1, rt.prompt_capacity), np.int32)
        padded[0, 0] = ids.sot
        res = rt.run_window(
            padded, np.ones((1,), np.int32), cross,
            np.zeros((1,), np.int32), np.full((1,), 10**6, np.int32),
        )
        results[name] = (
            list(np.asarray(res.tokens)[0][: int(np.asarray(res.result_len)[0])]),
            bool(np.asarray(res.failed)[0]),
        )
    assert results["einsum"] == results["pallas"]
