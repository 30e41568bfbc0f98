"""Transcript output writers: txt / srt / vtt / wts / csv.

The CLI example's writer set (reference Examples/main/textWriter.h:4-7,
miscUtils.cpp timestamp formatting). Times come in centiseconds.
"""

from __future__ import annotations

from typing import TextIO

from whisper_tpu.api.result import TranscribeResult


def _ts(t_cs: int, comma: bool = False) -> str:
    """Centiseconds -> HH:MM:SS.mmm (to_timestamp, ContextImpl.cpp:420-434)."""
    msec = t_cs * 10
    hr, msec = divmod(msec, 3_600_000)
    mn, msec = divmod(msec, 60_000)
    sec, msec = divmod(msec, 1_000)
    sep = "," if comma else "."
    return f"{hr:02d}:{mn:02d}:{sec:02d}{sep}{msec:03d}"


def write_txt(result: TranscribeResult, f: TextIO, timestamps: bool = False) -> None:
    for seg in result:
        if timestamps:
            f.write(f"[{_ts(seg.t0)} --> {_ts(seg.t1)}]  {seg.text.strip()}\n")
        else:
            f.write(seg.text)
    if not timestamps:
        f.write("\n")


def write_srt(result: TranscribeResult, f: TextIO) -> None:
    for i, seg in enumerate(result, 1):
        f.write(f"{i}\n{_ts(seg.t0, True)} --> {_ts(seg.t1, True)}\n{seg.text.strip()}\n\n")


def write_vtt(result: TranscribeResult, f: TextIO) -> None:
    f.write("WEBVTT\n\n")
    for seg in result:
        f.write(f"{_ts(seg.t0)} --> {_ts(seg.t1)}\n{seg.text.strip()}\n\n")


def write_csv(result: TranscribeResult, f: TextIO) -> None:
    f.write("start_cs,end_cs,text\n")
    for seg in result:
        text = seg.text.strip().replace('"', '""')
        f.write(f'{seg.t0},{seg.t1},"{text}"\n')


def write_wts(result: TranscribeResult, f: TextIO, audio_path: str, audio_len_s: float) -> None:
    """karaoke video script (reference main.cpp outputWts analogue)."""
    f.write("#!/bin/bash\n\nffmpeg_path=$(which ffmpeg)\n")
    for i, seg in enumerate(result):
        f.write(f"# segment {i}: [{_ts(seg.t0)} --> {_ts(seg.t1)}] {seg.text.strip()}\n")


WRITERS = {
    "txt": write_txt,
    "srt": write_srt,
    "vtt": write_vtt,
    "csv": write_csv,
}
