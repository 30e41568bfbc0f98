"""Numerics ground truth: our jnp model vs transformers' torch Whisper.

The analogue of the reference's BUILD_BOTH_VERSIONS strategy (SURVEY.md §4.1):
both implementations run the SAME f16-quantized weights (from a synthetic
GGML checkpoint), so disagreement isolates model-code bugs, not data.
"""

import numpy as np
import pytest

from tests.helpers import TINY_TEST_DIMS, make_random_checkpoint

torch = pytest.importorskip("torch")


def _hf_model_from_checkpoint(cp):
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    d = cp.dims
    config = WhisperConfig(
        vocab_size=d.n_vocab,
        num_mel_bins=d.n_mels,
        d_model=d.n_audio_state,
        encoder_layers=d.n_audio_layer,
        encoder_attention_heads=d.n_audio_head,
        decoder_layers=d.n_text_layer,
        decoder_attention_heads=d.n_text_head,
        encoder_ffn_dim=4 * d.n_audio_state,
        decoder_ffn_dim=4 * d.n_text_state,
        max_source_positions=d.n_audio_ctx,
        max_target_positions=d.n_text_ctx,
        activation_function="gelu",
    )
    model = WhisperForConditionalGeneration(config)

    def t(name):
        return torch.from_numpy(
            np.asarray(cp.tensors[name].data, np.float32).reshape(
                cp.tensors[name].data.shape
            )
        )

    sd = {}
    sd["model.encoder.embed_positions.weight"] = t("encoder.positional_embedding")
    for cv in ("conv1", "conv2"):
        sd[f"model.encoder.{cv}.weight"] = t(f"encoder.{cv}.weight")
        sd[f"model.encoder.{cv}.bias"] = t(f"encoder.{cv}.bias")
    sd["model.encoder.layer_norm.weight"] = t("encoder.ln_post.weight")
    sd["model.encoder.layer_norm.bias"] = t("encoder.ln_post.bias")
    pairs = [
        ("attn_ln", "self_attn_layer_norm", True),
        ("attn.query", "self_attn.q_proj", True),
        ("attn.key", "self_attn.k_proj", False),
        ("attn.value", "self_attn.v_proj", True),
        ("attn.out", "self_attn.out_proj", True),
        ("mlp_ln", "final_layer_norm", True),
        ("mlp.0", "fc1", True),
        ("mlp.2", "fc2", True),
    ]
    xpairs = [
        ("cross_attn_ln", "encoder_attn_layer_norm", True),
        ("cross_attn.query", "encoder_attn.q_proj", True),
        ("cross_attn.key", "encoder_attn.k_proj", False),
        ("cross_attn.value", "encoder_attn.v_proj", True),
        ("cross_attn.out", "encoder_attn.out_proj", True),
    ]
    for i in range(d.n_audio_layer):
        for g, h, bias in pairs:
            sd[f"model.encoder.layers.{i}.{h}.weight"] = t(f"encoder.blocks.{i}.{g}.weight")
            if bias:
                sd[f"model.encoder.layers.{i}.{h}.bias"] = t(f"encoder.blocks.{i}.{g}.bias")
    for i in range(d.n_text_layer):
        for g, h, bias in pairs + xpairs:
            sd[f"model.decoder.layers.{i}.{h}.weight"] = t(f"decoder.blocks.{i}.{g}.weight")
            if bias:
                sd[f"model.decoder.layers.{i}.{h}.bias"] = t(f"decoder.blocks.{i}.{g}.bias")
    sd["model.decoder.embed_tokens.weight"] = t("decoder.token_embedding.weight")
    sd["model.decoder.embed_positions.weight"] = t("decoder.positional_embedding")
    sd["model.decoder.layer_norm.weight"] = t("decoder.ln.weight")
    sd["model.decoder.layer_norm.bias"] = t("decoder.ln.bias")
    sd["proj_out.weight"] = sd["model.decoder.embed_tokens.weight"]

    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert not missing, missing
    return model.eval()


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import jax.numpy as jnp

    from whisper_tpu.ggml import load_checkpoint
    from whisper_tpu.model.params import DtypePolicy, params_from_checkpoint

    path = str(tmp_path_factory.mktemp("m") / "tiny.bin")
    make_random_checkpoint(path, TINY_TEST_DIMS, seed=1)
    cp = load_checkpoint(path)
    params = params_from_checkpoint(cp, DtypePolicy.f32())
    hf = _hf_model_from_checkpoint(cp)

    rng = np.random.default_rng(7)
    mel = rng.standard_normal((1, 80, 2 * TINY_TEST_DIMS.n_audio_ctx)).astype(np.float32)
    return cp, params, hf, mel, jnp


def test_encoder_matches_torch(setup):
    cp, params, hf, mel, jnp = setup
    from whisper_tpu.model.encoder import encode

    ours = np.asarray(encode(params, cp.dims, jnp.asarray(mel), compute_dtype=jnp.float32))
    with torch.no_grad():
        theirs = hf.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    assert ours.shape == theirs.shape
    assert np.max(np.abs(ours - theirs)) < 1e-3


def test_decoder_matches_torch(setup):
    cp, params, hf, mel, jnp = setup
    from whisper_tpu.model.decoder import decode_step, init_self_kv
    from whisper_tpu.model.encoder import encode, precompute_cross_kv

    tokens = np.array([[50257, 100, 200, 300, 400, 500, 600]], np.int32)

    feats = encode(params, cp.dims, jnp.asarray(mel), compute_dtype=jnp.float32)
    cross = precompute_cross_kv(params, cp.dims, feats, compute_dtype=jnp.float32)
    kv = init_self_kv(cp.dims, 1, dtype=jnp.float32)
    logits, kv = decode_step(
        params, cp.dims, jnp.asarray(tokens), jnp.zeros((1,), jnp.int32), kv, cross,
        compute_dtype=jnp.float32, last_only=False,
    )
    ours = np.asarray(logits)  # [1, S, V]

    with torch.no_grad():
        theirs = hf(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)),
        ).logits.numpy()
    assert ours.shape == theirs.shape
    assert np.max(np.abs(ours - theirs)) < 2e-3


def test_incremental_equals_batch(setup):
    """Feeding tokens one-by-one through the KV cache must equal the
    teacher-forced pass (validates cache append + masking)."""
    cp, params, hf, mel, jnp = setup
    from whisper_tpu.model.decoder import decode_step, init_self_kv
    from whisper_tpu.model.encoder import encode, precompute_cross_kv

    tokens = np.array([[50257, 11, 22, 33, 44]], np.int32)
    feats = encode(params, cp.dims, jnp.asarray(mel), compute_dtype=jnp.float32)
    cross = precompute_cross_kv(params, cp.dims, feats, compute_dtype=jnp.float32)

    kv = init_self_kv(cp.dims, 1, dtype=jnp.float32)
    full, _ = decode_step(
        params, cp.dims, jnp.asarray(tokens), jnp.zeros((1,), jnp.int32), kv, cross,
        compute_dtype=jnp.float32, last_only=False,
    )

    kv = init_self_kv(cp.dims, 1, dtype=jnp.float32)
    step_logits = []
    for i in range(tokens.shape[1]):
        lg, kv = decode_step(
            params, cp.dims, jnp.asarray(tokens[:, i : i + 1]),
            jnp.full((1,), i, jnp.int32), kv, cross,
            write_pos=i, compute_dtype=jnp.float32,
        )
        step_logits.append(np.asarray(lg))
    inc = np.stack(step_logits, axis=1)  # [1, S, V]
    assert np.max(np.abs(inc - np.asarray(full))) < 1e-4
