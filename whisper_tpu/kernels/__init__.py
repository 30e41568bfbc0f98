from whisper_tpu.kernels.attention import flash_attention

__all__ = ["flash_attention"]
