"""Parameter/activation sharding rules (tensor parallelism).

Megatron-style layout for the transformer blocks, expressed as
NamedShardings on the stacked [L, ...] parameter pytree (SURVEY.md §2.10):

  - q/k/v projections  [L, d, d]   -> output (head) dim on "model"
  - out projection     [L, d, d]   -> input dim on "model" (psum after)
  - fc1                [L, d, 4d]  -> hidden dim on "model"
  - fc2                [L, 4d, d]  -> input (hidden) dim on "model"
  - token embedding    [V, d]      -> vocab dim on "model" (sharded logits)
  - layernorms, biases of reduced outputs, conv stem, positions: replicated

Activations keep batch on "data". Under jit, GSPMD propagates these seeds
and inserts the ICI collectives.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from whisper_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# leaf name -> PartitionSpec (stacked [L, ...] tensors)
_BLOCK_RULES = {
    # fused head-major QKV: splitting the 3d axis assigns whole heads/chip
    "qkv_w": P(None, None, MODEL_AXIS),
    "qkv_b": P(None, MODEL_AXIS),
    "o_w": P(None, MODEL_AXIS, None),
    "o_b": P(None),
    "xq_w": P(None, None, MODEL_AXIS),
    "xq_b": P(None, MODEL_AXIS),
    "xk_w": P(None, None, MODEL_AXIS),
    "xv_w": P(None, None, MODEL_AXIS),
    "xv_b": P(None, MODEL_AXIS),
    "xo_w": P(None, MODEL_AXIS, None),
    "xo_b": P(None),
    "fc1_w": P(None, None, MODEL_AXIS),
    "fc1_b": P(None, MODEL_AXIS),
    "fc2_w": P(None, MODEL_AXIS, None),
    "fc2_b": P(None),
    # int8-weight scales [L, 1, out] follow their weight's OUTPUT-dim shard
    # (params.quantize_decoder_weights); in-dim-sharded weights (o/xo/fc2)
    # have replicated per-output scales
    "qkv_w_s": P(None, None, MODEL_AXIS),
    "xq_w_s": P(None, None, MODEL_AXIS),
    "fc1_w_s": P(None, None, MODEL_AXIS),
    "o_w_s": P(None),
    "xo_w_s": P(None),
    "fc2_w_s": P(None),
}

_TOP_RULES = {
    "tok": P(MODEL_AXIS, None),  # vocab-sharded logits matmul
    "tok_s": P(MODEL_AXIS, None),  # per-vocab-row int8 scales follow tok
}


def _spec_for(path) -> P:
    key = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    in_blocks = any(
        (p.key if hasattr(p, "key") else str(p)) == "blocks" for p in path[:-1]
    )
    if in_blocks and key in _BLOCK_RULES:
        return _BLOCK_RULES[key]
    if key in _TOP_RULES:
        return _TOP_RULES[key]
    return P()  # replicated


def param_shardings(params, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: NamedSharding(mesh, _spec_for(path)), params
    )


def shard_params(params, mesh: Mesh):
    """Place the parameter pytree onto the mesh."""
    return jax.tree_util.tree_map(
        jax.device_put, params, param_shardings(params, mesh)
    )


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """NamedSharding putting the batch dim on the data axis."""
    spec = [None] * ndim
    spec[batch_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def kv_sharding(mesh: Mesh) -> NamedSharding:
    """[L, B, HD, C] transposed KV caches: batch on data, features (head-major
    rows) on model."""
    return NamedSharding(mesh, P(None, DATA_AXIS, MODEL_AXIS, None))
