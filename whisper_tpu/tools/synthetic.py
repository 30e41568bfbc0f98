"""Synthetic (random-weight) parameter pytrees, built directly on device.

Benchmarks and compile checks need flagship-sized models without checkpoint
files; generating on device via jax.random avoids pushing gigabytes through
host->device transfer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from whisper_tpu.hparams import KNOWN_MODELS, ModelDims


def make_synthetic_params(
    dims: ModelDims, param_dtype=jnp.bfloat16, norm_dtype=jnp.float32,
    seed: int = 0, weights_int8: bool = False,
):
    """Random params with the exact pytree structure of params_from_checkpoint.
    ``weights_int8`` mirrors DtypePolicy.serving(): int8 decoder matmul
    weights + per-output-column f32 scales, quantized ON DEVICE."""
    d = dims.n_audio_state
    key = jax.random.PRNGKey(seed)
    counter = [0]

    def nrm(shape, dtype, scale=None):
        counter[0] += 1
        k = jax.random.fold_in(key, counter[0])
        s = scale if scale is not None else (1.0 / (shape[-1] ** 0.5))
        return (jax.random.normal(k, shape, jnp.float32) * s).astype(dtype)

    def ones(shape):
        return jnp.ones(shape, norm_dtype)

    def zeros(shape):
        return jnp.zeros(shape, norm_dtype)

    def enc_blocks(n_layer):
        return {
            "attn_ln_w": ones((n_layer, d)), "attn_ln_b": zeros((n_layer, d)),
            "qkv_w": nrm((n_layer, d, 3 * d), param_dtype), "qkv_b": zeros((n_layer, 3 * d)),
            "o_w": nrm((n_layer, d, d), param_dtype), "o_b": zeros((n_layer, d)),
            "mlp_ln_w": ones((n_layer, d)), "mlp_ln_b": zeros((n_layer, d)),
            "fc1_w": nrm((n_layer, d, 4 * d), param_dtype), "fc1_b": zeros((n_layer, 4 * d)),
            "fc2_w": nrm((n_layer, 4 * d, d), param_dtype), "fc2_b": zeros((n_layer, d)),
        }

    def dec_blocks(n_layer):
        b = enc_blocks(n_layer)
        b.update(
            x_ln_w=ones((n_layer, d)), x_ln_b=zeros((n_layer, d)),
            xq_w=nrm((n_layer, d, d), param_dtype), xq_b=zeros((n_layer, d)),
            xk_w=nrm((n_layer, d, d), param_dtype),
            xv_w=nrm((n_layer, d, d), param_dtype), xv_b=zeros((n_layer, d)),
            xo_w=nrm((n_layer, d, d), param_dtype), xo_b=zeros((n_layer, d)),
        )
        return b

    params = {
        "enc": {
            "pos": nrm((dims.n_audio_ctx, d), param_dtype, 0.02),
            "conv1_w": nrm((3, dims.n_mels, d), param_dtype),
            "conv1_b": zeros((d,)),
            "conv2_w": nrm((3, d, d), param_dtype),
            "conv2_b": zeros((d,)),
            "ln_post_w": ones((d,)), "ln_post_b": zeros((d,)),
            "blocks": enc_blocks(dims.n_audio_layer),
        },
        "dec": {
            "pos": nrm((dims.n_text_ctx, d), param_dtype, 0.02),
            "tok": nrm((dims.n_vocab, d), param_dtype, 0.02),
            "ln_w": ones((d,)), "ln_b": zeros((d,)),
            "blocks": dec_blocks(dims.n_text_layer),
        },
    }
    if weights_int8:
        from whisper_tpu.model.params import _QUANT_KEYS

        @jax.jit
        def _q(w):
            w = w.astype(jnp.float32)
            amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
            sc = jnp.maximum(amax, 1e-8) / 127.0
            return jnp.clip(jnp.round(w / sc), -127, 127).astype(jnp.int8), sc

        blocks = params["dec"]["blocks"]
        for key in sorted(_QUANT_KEYS & set(blocks)):
            blocks[key], blocks[key + "_s"] = _q(blocks[key])
        tok8, tok_s = _q(params["dec"]["tok"].T)
        params["dec"]["tok"] = tok8.T
        params["dec"]["tok_s"] = tok_s.T
    return params


def dims_for(name: str) -> ModelDims:
    return KNOWN_MODELS[name]
