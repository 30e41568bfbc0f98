#!/usr/bin/env python3
"""Build the native host runtime libraries with g++.

  libwhisper_native.so  — mel/fp16/energy host kernels, no external deps
  libwhisper_audio.so   — audio file decoder over libavformat/libavcodec
                          (built only when the FFmpeg dev libraries exist;
                          everything degrades gracefully without it)
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(ROOT, "whisper_tpu", "native")


def build_core() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread",
        os.path.join(NATIVE, "whisper_native.cpp"),
        "-o", os.path.join(NATIVE, "libwhisper_native.so"),
    ]
    print(" ".join(cmd))
    subprocess.run(cmd, check=True)


def build_audio() -> bool:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        os.path.join(NATIVE, "audio_decode.cpp"),
        "-o", os.path.join(NATIVE, "libwhisper_audio.so"),
        "-lavformat", "-lavcodec", "-lswresample", "-lavutil",
    ]
    print(" ".join(cmd))
    try:
        subprocess.run(cmd, check=True)
        return True
    except subprocess.CalledProcessError:
        print("audio decoder build failed (FFmpeg dev libs missing?) — "
              "skipping; file decode falls back to scipy/ffmpeg-binary")
        return False


def main() -> int:
    build_core()
    have_audio = build_audio()
    sys.path.insert(0, ROOT)
    from whisper_tpu import native

    assert native.available(), "built but failed to load"
    print(f"OK: libwhisper_native.so")
    if have_audio:
        from whisper_tpu.audio import ffdecode

        assert ffdecode.available(), "audio decoder built but failed to load"
        print(f"OK: libwhisper_audio.so")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
