"""Weight-only int8 decoder quantization (DtypePolicy.weights_int8).

Strategy mirrors the int8-KV tests: (a) quantization round-trip error is
bounded by the per-column step; (b) full-window greedy tokens must match the
f32 reference on a scripted checkpoint; (c) the sharded pytree (with scale
planes) still compiles and runs under TP on the virtual mesh.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import make_scripted_checkpoint, make_vocab_words
from whisper_tpu.config import KernelConfig
from whisper_tpu.ggml import load_checkpoint
from whisper_tpu.model.params import (
    DtypePolicy,
    params_from_checkpoint,
    quantize_weight,
)
from whisper_tpu.runtime.context import WhisperRuntime
from whisper_tpu.runtime.sampler import SpecialIds
from whisper_tpu.vocab import Vocabulary


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(3)
    w = (rng.standard_normal((4, 64, 96)) * 0.7).astype(np.float32)
    q, s = quantize_weight(w, axis=1)
    assert q.dtype == np.int8 and s.shape == (4, 1, 96)
    back = q.astype(np.float32) * s
    step = np.abs(w).max(axis=1, keepdims=True) / 127.0
    assert np.all(np.abs(back - w) <= step * 0.5 + 1e-7)


def _scripted_runtime(weights_int8: bool):
    beg, eot = 50_363, 50_256
    script = [beg, 32, 104, 105, 32, 116, 112, 117, beg + 96, eot]
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "m.bin")
        make_scripted_checkpoint(path, script)
        cp = load_checkpoint(path)
    policy = DtypePolicy(jnp.float32, jnp.float32, jnp.float32,
                         weights_int8=weights_int8)
    params = params_from_checkpoint(cp, policy)
    vocab = Vocabulary(make_vocab_words(cp.dims.n_vocab), cp.dims.n_vocab)
    ids = SpecialIds.from_vocab(vocab)
    rt = WhisperRuntime(params, cp.dims, ids, compute_dtype=jnp.float32,
                        kernels=KernelConfig.reference())
    return rt, ids, cp.dims, script


def test_decode_window_int8_weights_matches_reference_tokens():
    """Greedy margins on the scripted checkpoint are wide; <=0.4% relative
    weight quantization error must not flip any token."""
    results = {}
    for name, w8 in (("reference", False), ("int8", True)):
        rt, ids, dims, script = _scripted_runtime(w8)
        rng = np.random.default_rng(11)
        mel = rng.standard_normal((1, 80, 2 * dims.n_audio_ctx)).astype(np.float32)
        _, cross = rt.encode_window(mel)
        padded = np.zeros((1, rt.prompt_capacity), np.int32)
        padded[0, 0] = ids.sot
        res = rt.run_window(
            padded, np.ones((1,), np.int32), cross,
            np.zeros((1,), np.int32), np.full((1,), 10**6, np.int32),
        )
        results[name] = list(
            np.asarray(res.tokens)[0][: int(np.asarray(res.result_len)[0])]
        )
    assert results["reference"] == results["int8"] == script[:-1]


def test_int8_weights_shard_and_run_tp():
    """Scale planes carry the matching TP sharding (parallel/sharding.py);
    a sharded int8 decode step must compile + run and match single-device."""
    from whisper_tpu.hparams import ModelDims
    from whisper_tpu.model.decoder import decode_step, init_self_kv
    from whisper_tpu.model.encoder import precompute_cross_kv
    from whisper_tpu.parallel.mesh import make_mesh
    from whisper_tpu.parallel.sharding import shard_params
    from whisper_tpu.tools.synthetic import make_synthetic_params

    dims = ModelDims(
        n_vocab=512, n_audio_ctx=32, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_text_ctx=16, n_text_head=4, n_text_state=64,
        n_text_layer=2, n_mels=80, ftype=1,
    )
    params = make_synthetic_params(dims, jnp.float32, weights_int8=True)
    assert params["dec"]["blocks"]["qkv_w"].dtype == jnp.int8
    assert "tok_s" in params["dec"]

    feats = jnp.ones((2, dims.n_audio_ctx, 64), jnp.float32) * 0.1
    cross = precompute_cross_kv(params, dims, feats, compute_dtype=jnp.float32)
    tokens = np.array([[3, 5], [7, 9]], np.int32)

    def step(params, cross):
        kv = init_self_kv(dims, 2, dtype=jnp.float32)
        logits, _ = decode_step(
            params, dims, tokens, jnp.zeros((2,), jnp.int32), kv, cross,
            compute_dtype=jnp.float32,
        )
        return logits

    base = np.asarray(jax.jit(step)(params, cross))

    mesh = make_mesh(n_model=2)
    sharded = shard_params(params, mesh)
    with mesh:
        got = np.asarray(jax.jit(step)(sharded, cross))
    np.testing.assert_allclose(got, base, atol=2e-4, rtol=1e-4)
