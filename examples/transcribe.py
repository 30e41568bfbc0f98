#!/usr/bin/env python3
"""Minimal API example (TranscribeCS analogue, Examples/TranscribeCS).

  python examples/transcribe.py ggml-base.en.bin audio.wav
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import whisper_tpu
from whisper_tpu.audio import load_audio_file


def main() -> int:
    model_path, audio_path = sys.argv[1], sys.argv[2]
    model = whisper_tpu.load_model(model_path)
    ctx = model.create_context()
    buf = load_audio_file(audio_path)
    result = ctx.run_full(None, buf.mono)
    for seg in result:
        t0, t1 = seg.time_seconds
        print(f"[{t0:7.2f} -> {t1:7.2f}] {seg.text.strip()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
