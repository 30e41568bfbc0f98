"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Tensor-parallel (model axis) and data-parallel (batch axis) execution must
match single-device numerics — GSPMD may only change the math by collective
reduction order (f32 tolerances).
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from tests.helpers import TINY_TEST_DIMS, make_random_checkpoint, make_vocab_words
    from whisper_tpu.ggml import load_checkpoint
    from whisper_tpu.model.params import DtypePolicy, params_from_checkpoint
    from whisper_tpu.runtime.sampler import SpecialIds
    from whisper_tpu.vocab import Vocabulary

    path = str(tmp_path_factory.mktemp("sh") / "m.bin")
    make_random_checkpoint(path, TINY_TEST_DIMS, seed=60)
    cp = load_checkpoint(path)
    params = params_from_checkpoint(cp, DtypePolicy.f32())
    vocab = Vocabulary(make_vocab_words(cp.dims.n_vocab), cp.dims.n_vocab)
    ids = SpecialIds.from_vocab(vocab)
    rng = np.random.default_rng(61)
    mel = rng.standard_normal((4, 80, 2 * cp.dims.n_audio_ctx)).astype(np.float32)
    return cp, params, ids, mel, jax, jnp


def _run(cp, params, ids, mel, jnp, mesh=None):
    import jax

    from whisper_tpu.model.decoder import init_self_kv
    from whisper_tpu.model.encoder import encode, precompute_cross_kv
    from whisper_tpu.runtime.decode import decode_window

    b = mel.shape[0]
    if mesh is not None:
        from whisper_tpu.parallel.sharding import batch_sharding, shard_params

        params = shard_params(params, mesh)
        mel = jax.device_put(mel, batch_sharding(mesh, 3))

    prompt = np.full((b, 4), ids.sot, np.int32)
    plen = np.ones((b,), np.int32)
    seek = np.zeros((b,), np.int32)
    seek_end = np.full((b,), 10**6, np.int32)

    @jax.jit
    def step(params, mel, prompt, plen, seek, seek_end):
        feats = encode(params, cp.dims, mel, compute_dtype=jnp.float32)
        cross = precompute_cross_kv(params, cp.dims, feats, compute_dtype=jnp.float32)
        kv = init_self_kv(cp.dims, b, dtype=jnp.float32)
        return feats, decode_window(
            params, cp.dims, ids, prompt, plen, kv, cross, seek, seek_end,
            compute_dtype=jnp.float32,
        )

    ctx = mesh if mesh is not None else __import__("contextlib").nullcontext()
    with ctx:
        feats, res = step(params, mel, prompt, plen, seek, seek_end)
    return np.asarray(feats), {k: np.asarray(v) for k, v in res._asdict().items()}


def test_tp_dp_matches_single_device(setup):
    cp, params, ids, mel, jax, jnp = setup
    from whisper_tpu.parallel.mesh import make_mesh

    feats1, res1 = _run(cp, params, ids, mel, jnp, mesh=None)
    mesh = make_mesh(n_model=2)  # 4 data x 2 model over 8 CPU devices
    feats2, res2 = _run(cp, params, ids, mel, jnp, mesh=mesh)

    assert np.max(np.abs(feats1 - feats2)) < 1e-3
    assert (res1["result_len"] == res2["result_len"]).all()
    assert (res1["seek_delta"] == res2["seek_delta"]).all()
    for lane in range(mel.shape[0]):
        n = int(res1["result_len"][lane])
        assert list(res1["tokens"][lane][:n]) == list(res2["tokens"][lane][:n])


def test_data_parallel_only(setup):
    cp, params, ids, mel, jax, jnp = setup
    from whisper_tpu.parallel.mesh import make_mesh

    feats1, res1 = _run(cp, params, ids, mel, jnp, mesh=None)
    mesh = make_mesh(n_model=1, devices=jax.devices()[:4])  # pure DP, 1 lane/device
    feats2, res2 = _run(cp, params, ids, mel, jnp, mesh=mesh)
    assert np.max(np.abs(feats1 - feats2)) < 1e-3
    assert (res1["tokens"] == res2["tokens"]).all()


def test_param_sharding_specs(setup):
    cp, params, ids, mel, jax, jnp = setup
    from whisper_tpu.parallel.mesh import make_mesh
    from whisper_tpu.parallel.sharding import param_shardings

    mesh = make_mesh(n_model=2)
    sh = param_shardings(params, mesh)
    # spot-check the TP layout
    assert sh["dec"]["blocks"]["qkv_w"].spec == ("model",) or str(
        sh["dec"]["blocks"]["qkv_w"].spec
    ).endswith("'model')")
    assert "model" in str(sh["dec"]["tok"].spec)
    assert "model" not in str(sh["enc"]["conv1_w"].spec)
