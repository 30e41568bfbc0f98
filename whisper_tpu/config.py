"""Kernel/backend configuration — the ``enableInexactOptimizations`` tier.

The reference switches between fused fast shaders and bit-exact compat
shaders at compile time (MlContext.h:15-18). Here the jnp reference path and
the Pallas kernels are both always available and selected per-run:

  KernelConfig(flash_attention=False)  -> pure-jnp numerics reference
  KernelConfig(flash_attention=True)   -> Pallas fused kernels (TPU)
  KernelConfig(..., interpret=True)    -> Pallas interpreter (CPU testing)
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class KernelConfig:
    flash_attention: bool = True
    interpret: bool = False

    @staticmethod
    def auto() -> "KernelConfig":
        """Pallas on TPU, jnp reference elsewhere."""
        import jax

        on_tpu = jax.default_backend() == "tpu"
        return KernelConfig(flash_attention=on_tpu, interpret=False)

    @staticmethod
    def reference() -> "KernelConfig":
        return KernelConfig(flash_attention=False)
