from whisper_tpu.features.filters import mel_filter_bank
from whisper_tpu.features.mel import LogMelSpectrogram, log_mel_spectrogram

__all__ = ["mel_filter_bank", "LogMelSpectrogram", "log_mel_spectrogram"]
