#!/usr/bin/env python3
"""Build the native host runtime: g++ -O3 -shared whisper_native.cpp."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "whisper_tpu", "native", "whisper_native.cpp")
OUT = os.path.join(ROOT, "whisper_tpu", "native", "libwhisper_native.so")


def main() -> int:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", SRC, "-o", OUT,
    ]
    print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    sys.path.insert(0, ROOT)
    from whisper_tpu import native

    assert native.available(), "built but failed to load"
    print(f"OK: {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
