"""Kernel/backend configuration — the ``enableInexactOptimizations`` tier.

The reference switches between fused fast shaders and bit-exact compat
shaders at compile time (MlContext.h:15-18). Here the jnp reference path and
the Pallas kernels are both always available and selected per-run:

  KernelConfig(flash_attention=False)  -> pure-jnp numerics reference
  KernelConfig(flash_attention=True)   -> Pallas fused kernels (TPU)
  KernelConfig(..., interpret=True)    -> Pallas interpreter (CPU testing)
  KernelConfig(..., kv_int8=True)      -> int8 KV caches with per-token
      scales (kernels/quant.py) — halves the decode-dominant KV streams;
      the serving-throughput tier (quantization step <= 1/127 per column,
      vs the reference's FP16 cache storage, KeyValueBuffers.h:7-53)
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class KernelConfig:
    flash_attention: bool = True
    interpret: bool = False
    kv_int8: bool = False

    @staticmethod
    def auto() -> "KernelConfig":
        """Pallas on TPU, jnp reference elsewhere."""
        import jax

        on_tpu = jax.default_backend() == "tpu"
        return KernelConfig(flash_attention=on_tpu, interpret=False)

    @staticmethod
    def serving() -> "KernelConfig":
        """Throughput mode: Pallas kernels + int8 KV caches."""
        cfg = KernelConfig.auto()
        return dataclasses.replace(cfg, kv_int8=True)

    @staticmethod
    def reference() -> "KernelConfig":
        return KernelConfig(flash_attention=False)
