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
import os


def is_tpu_device() -> bool:
    """True when the default JAX device is a TPU chip.

    Detection is by DEVICE KIND, not backend/platform name: experimental
    TPU plugins register platform names other than "tpu" (e.g. 'axon'),
    so ``jax.default_backend() == "tpu"`` silently misses real chips and
    would drop every Pallas kernel. ``WHISPER_TPU_FORCE_PALLAS=0/1``
    overrides for debugging.
    """
    force = os.environ.get("WHISPER_TPU_FORCE_PALLAS")
    if force is not None:
        return force not in ("0", "false", "")
    import jax

    try:
        d = jax.devices()[0]
    except Exception:
        return False
    kind = getattr(d, "device_kind", "") or ""
    platform = getattr(d, "platform", "") or ""
    return platform.lower() == "tpu" or "tpu" in kind.lower()


@dataclasses.dataclass(frozen=True)
class KernelConfig:
    flash_attention: bool = True
    interpret: bool = False
    kv_int8: bool = False

    @staticmethod
    def auto() -> "KernelConfig":
        """Pallas on TPU, jnp reference elsewhere."""
        return KernelConfig(flash_attention=is_tpu_device(), interpret=False)

    @staticmethod
    def serving() -> "KernelConfig":
        """Throughput mode: Pallas kernels + int8 KV caches.

        kv_int8 is gated on flash_attention: the int8 win only exists when
        dequant is fused inside the decode kernel — the einsum fallback
        would dequantize BOTH full caches to compute dtype every step,
        costing more bandwidth than the bf16 baseline it aims to beat.
        """
        cfg = KernelConfig.auto()
        return dataclasses.replace(cfg, kv_int8=cfg.flash_attention)

    @staticmethod
    def reference() -> "KernelConfig":
        return KernelConfig(flash_attention=False)

    def describe(self) -> str:
        return (
            f"KernelConfig(flash_attention={self.flash_attention}, "
            f"kv_int8={self.kv_int8}, interpret={self.interpret})"
        )
