"""Checkpoint -> device parameter pytree.

Replaces the reference's typed weight registry + per-tensor VRAM upload
(Whisper/Whisper/ModelBuffers.h:8-116, WhisperModel.cpp:257-340) with a
nested-dict pytree of jax arrays:

  - per-layer tensors are STACKED on a leading [n_layer, ...] axis so the
    transformer blocks run under ``lax.scan`` (one compiled block body
    instead of n_layer unrolled copies — the XLA-native answer to the
    reference's per-layer dispatch loop)
  - matmul weights are stored [in, out] ("kernel" layout, x @ w) in the
    policy's param dtype (bf16 by default — MXU-native)
  - layernorm weights/biases stay f32 (numerics)

The reference's AMD "panel reshape" (Reshaper.cpp:30-74) has no equivalent
here: XLA layout assignment owns physical tiling.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.ggml import Checkpoint, RawTensor, load_checkpoint
from whisper_tpu.hparams import ModelDims

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DtypePolicy:
    """bf16 storage + f32 accumulation is the TPU analogue of the
    reference's FP16 storage + FP32 shader math (SURVEY.md §7).

    ``weights_int8`` additionally stores the DECODER matmul weights (and the
    token embedding) as int8 with one f32 scale per output column — decode is
    weight-stream-bound at small batch, so halving weight bytes attacks the
    dominant HBM stream (BASELINE.md bottleneck analysis). The encoder stays
    bf16: it is MXU-bound, not weight-bound."""

    param_dtype: Any = jnp.bfloat16
    compute_dtype: Any = jnp.bfloat16
    norm_dtype: Any = jnp.float32
    weights_int8: bool = False

    @staticmethod
    def f32() -> "DtypePolicy":
        return DtypePolicy(jnp.float32, jnp.float32, jnp.float32)

    @staticmethod
    def serving() -> "DtypePolicy":
        """Throughput tier: bf16 activations, int8 decoder weights."""
        return DtypePolicy(weights_int8=True)


def _get(tensors: dict[str, RawTensor], name: str, shape: tuple[int, ...]) -> np.ndarray:
    if name not in tensors:
        raise ValueError(f"missing tensor {name!r} in checkpoint")
    arr = tensors[name].data
    if int(np.prod(arr.shape)) != int(np.prod(shape)):
        raise ValueError(f"{name}: size mismatch {arr.shape} vs expected {shape}")
    return np.asarray(arr, np.float32).reshape(shape)


def fuse_qkv(
    q_w: np.ndarray, q_b: np.ndarray, k_w: np.ndarray,
    v_w: np.ndarray, v_b: np.ndarray, n_head: int, scale: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Build the fused QKV projection [d, 3d] in HEAD-MAJOR column order:
    column group h holds (q_h, k_h, v_h), each head_dim wide.

    Why: decode is GEMV/launch-bound — one wide matmul streams weights at
    ~3x the bandwidth of three [d,d] ops (measured on v5e). Head-major
    ordering keeps the tensor-parallel sharding clean: splitting the 3d
    axis over the model mesh axis assigns whole heads per chip.

    The whisper (d/h)^-0.25 scaling of q AND k (WhisperContext.cpp:360-388)
    is folded into the weights/bias here, removing two multiplies per step.
    """
    d = q_w.shape[0]
    dh = d // n_head
    # [d, H, 3, Dh]
    out = np.empty((d, n_head, 3, dh), np.float32)
    out[:, :, 0, :] = (q_w * scale).reshape(d, n_head, dh)
    out[:, :, 1, :] = (k_w * scale).reshape(d, n_head, dh)
    out[:, :, 2, :] = v_w.reshape(d, n_head, dh)
    bias = np.zeros((n_head, 3, dh), np.float32)
    bias[:, 0, :] = (q_b * scale).reshape(n_head, dh)
    bias[:, 2, :] = v_b.reshape(n_head, dh)  # k has no bias (GGML convention)
    return out.reshape(d, 3 * d), bias.reshape(3 * d)


def _stack_blocks(
    tensors: dict[str, RawTensor],
    prefix: str,
    n_layer: int,
    d: int,
    n_head: int,
    cross: bool,
) -> dict[str, np.ndarray]:
    """Collect per-layer tensors into stacked arrays, transposing Linear
    weights from torch [out, in] to kernel [in, out]; q/k/v fuse into one
    head-major QKV projection with attention scales pre-folded."""

    scale = float(d // n_head) ** -0.25

    def gather(fmt: str, shape: tuple[int, ...], transpose: bool = False):
        arrs = []
        for i in range(n_layer):
            a = _get(tensors, fmt.format(prefix=prefix, i=i), shape)
            arrs.append(a.T if transpose else a)
        return np.stack(arrs)

    def gather_qkv(p_attn: str):
        ws, bs = [], []
        for i in range(n_layer):
            w, b = fuse_qkv(
                _get(tensors, f"{prefix}.blocks.{i}.{p_attn}.query.weight", (d, d)).T,
                _get(tensors, f"{prefix}.blocks.{i}.{p_attn}.query.bias", (d,)),
                _get(tensors, f"{prefix}.blocks.{i}.{p_attn}.key.weight", (d, d)).T,
                _get(tensors, f"{prefix}.blocks.{i}.{p_attn}.value.weight", (d, d)).T,
                _get(tensors, f"{prefix}.blocks.{i}.{p_attn}.value.bias", (d,)),
                n_head, scale,
            )
            ws.append(w)
            bs.append(b)
        return np.stack(ws), np.stack(bs)

    qkv_w, qkv_b = gather_qkv("attn")
    blocks = {
        "attn_ln_w": gather("{prefix}.blocks.{i}.attn_ln.weight", (d,)),
        "attn_ln_b": gather("{prefix}.blocks.{i}.attn_ln.bias", (d,)),
        "qkv_w": qkv_w,
        "qkv_b": qkv_b,
        "o_w": gather("{prefix}.blocks.{i}.attn.out.weight", (d, d), transpose=True),
        "o_b": gather("{prefix}.blocks.{i}.attn.out.bias", (d,)),
        "mlp_ln_w": gather("{prefix}.blocks.{i}.mlp_ln.weight", (d,)),
        "mlp_ln_b": gather("{prefix}.blocks.{i}.mlp_ln.bias", (d,)),
        "fc1_w": gather("{prefix}.blocks.{i}.mlp.0.weight", (4 * d, d), transpose=True),
        "fc1_b": gather("{prefix}.blocks.{i}.mlp.0.bias", (4 * d,)),
        "fc2_w": gather("{prefix}.blocks.{i}.mlp.2.weight", (d, 4 * d), transpose=True),
        "fc2_b": gather("{prefix}.blocks.{i}.mlp.2.bias", (d,)),
    }
    if cross:
        blocks.update(
            x_ln_w=gather("{prefix}.blocks.{i}.cross_attn_ln.weight", (d,)),
            x_ln_b=gather("{prefix}.blocks.{i}.cross_attn_ln.bias", (d,)),
            # scales folded like the self-attn path
            xq_w=gather("{prefix}.blocks.{i}.cross_attn.query.weight", (d, d), transpose=True) * scale,
            xq_b=gather("{prefix}.blocks.{i}.cross_attn.query.bias", (d,)) * scale,
            xk_w=gather("{prefix}.blocks.{i}.cross_attn.key.weight", (d, d), transpose=True) * scale,
            xv_w=gather("{prefix}.blocks.{i}.cross_attn.value.weight", (d, d), transpose=True),
            xv_b=gather("{prefix}.blocks.{i}.cross_attn.value.bias", (d,)),
            xo_w=gather("{prefix}.blocks.{i}.cross_attn.out.weight", (d, d), transpose=True),
            xo_b=gather("{prefix}.blocks.{i}.cross_attn.out.bias", (d,)),
        )
    return blocks


_NORM_KEYS = frozenset(
    k
    for k in (
        "attn_ln_w attn_ln_b mlp_ln_w mlp_ln_b x_ln_w x_ln_b "
        "ln_post_w ln_post_b ln_w ln_b"
    ).split()
)
_BIAS_KEYS = frozenset(
    "qkv_b o_b fc1_b fc2_b xq_b xv_b xo_b conv1_b conv2_b".split()
)


# decoder matmul weights eligible for int8 storage ([L, in, out] stacked);
# xk_w/xv_w are excluded: they run once per 30 s window (cross-KV precompute)
# and their output IS the (already separately quantizable) cross cache.
_QUANT_KEYS = frozenset("qkv_w o_w xq_w xo_w fc1_w fc2_w".split())


def quantize_weight(w: np.ndarray, axis: int) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-output-column int8: one f32 scale per slice along
    ``axis`` (the contraction axis). Returns (int8 w, f32 scale) with the
    scale keeping a size-1 dim at ``axis`` so it broadcasts over the matmul
    output."""
    amax = np.abs(w).max(axis=axis, keepdims=True)
    scale = np.maximum(amax, 1e-8).astype(np.float32) / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale


def quantize_decoder_weights(dec: Params) -> Params:
    """int8-quantize a (host, f32 numpy) decoder subtree in place:
    each eligible weight W[..., in, out] becomes int8 plus ``<key>_s``
    f32 [..., 1, out]; the token embedding [V, d] gets per-ROW scales
    ``tok_s`` [V, 1] (its contraction axis in the logits matmul is d)."""
    blocks = dec["blocks"]
    for key in sorted(_QUANT_KEYS & set(blocks)):
        q, s = quantize_weight(blocks[key], axis=1)
        blocks[key] = q
        blocks[key + "_s"] = s
    q, s = quantize_weight(dec["tok"], axis=1)
    dec["tok"] = q
    dec["tok_s"] = s
    return dec


def params_from_checkpoint(
    cp: Checkpoint, policy: DtypePolicy = DtypePolicy(), device_put: bool = True
) -> Params:
    """Build the parameter pytree from a loaded checkpoint."""
    dims = cp.dims
    d = dims.n_audio_state
    t = cp.tensors

    host: Params = {
        "enc": {
            "pos": _get(t, "encoder.positional_embedding", (dims.n_audio_ctx, d)),
            # conv weights: torch Conv1d [out, in, k] -> [k, in, out] for
            # lax.conv_general_dilated with ("NHC","HIO","NHC")
            "conv1_w": _get(t, "encoder.conv1.weight", (d, dims.n_mels, 3)).transpose(2, 1, 0),
            "conv1_b": _get(t, "encoder.conv1.bias", (d,)),
            "conv2_w": _get(t, "encoder.conv2.weight", (d, d, 3)).transpose(2, 1, 0),
            "conv2_b": _get(t, "encoder.conv2.bias", (d,)),
            "ln_post_w": _get(t, "encoder.ln_post.weight", (d,)),
            "ln_post_b": _get(t, "encoder.ln_post.bias", (d,)),
            "blocks": _stack_blocks(t, "encoder", dims.n_audio_layer, d, dims.n_audio_head, cross=False),
        },
        "dec": {
            "pos": _get(t, "decoder.positional_embedding", (dims.n_text_ctx, d)),
            "tok": _get(t, "decoder.token_embedding.weight", (dims.n_vocab, d)),
            "ln_w": _get(t, "decoder.ln.weight", (d,)),
            "ln_b": _get(t, "decoder.ln.bias", (d,)),
            "blocks": _stack_blocks(t, "decoder", dims.n_text_layer, d, dims.n_text_head, cross=True),
        },
    }
    if policy.weights_int8:
        host["dec"] = quantize_decoder_weights(host["dec"])

    def cast(path, leaf):
        key = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if leaf.dtype == np.int8 or key.endswith("_s"):
            return jnp.asarray(leaf)  # int8 weights / f32 scales: keep as-is
        if key in _NORM_KEYS or key in _BIAS_KEYS:
            dt = policy.norm_dtype
        else:
            dt = policy.param_dtype
        arr = jnp.asarray(leaf, dt)
        return arr

    params = jax.tree_util.tree_map_with_path(cast, host)
    return params


def load_params(
    path: str, policy: DtypePolicy = DtypePolicy(), progress=None
) -> tuple[ModelDims, Params, Checkpoint]:
    cp = load_checkpoint(path, progress=progress)
    return cp.dims, params_from_checkpoint(cp, policy), cp
