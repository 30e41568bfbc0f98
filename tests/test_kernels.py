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
