from whisper_tpu.audio.load import load_audio_file, resample_to_16k, speedup_2x

__all__ = ["load_audio_file", "resample_to_16k", "speedup_2x"]
