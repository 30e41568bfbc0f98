"""CLI + writer tests (no model load: writers run on synthetic results)."""

import io

from whisper_tpu.api.result import Segment, TranscribeResult
from whisper_tpu.cli.writers import write_csv, write_srt, write_txt, write_vtt


def _result():
    return TranscribeResult(
        segments=[
            Segment(text=" Hello world.", t0=0, t1=250),
            Segment(text=" Second segment.", t0=250, t1=730),
        ]
    )


def test_srt():
    f = io.StringIO()
    write_srt(_result(), f)
    out = f.getvalue()
    assert "1\n00:00:00,000 --> 00:00:02,500\nHello world.\n" in out
    assert "2\n00:00:02,500 --> 00:00:07,300\nSecond segment.\n" in out


def test_vtt():
    f = io.StringIO()
    write_vtt(_result(), f)
    assert f.getvalue().startswith("WEBVTT\n\n00:00:00.000 --> 00:00:02.500\n")


def test_txt_plain_and_timestamps():
    f = io.StringIO()
    write_txt(_result(), f)
    assert f.getvalue() == " Hello world. Second segment.\n"
    f = io.StringIO()
    write_txt(_result(), f, timestamps=True)
    assert "[00:00:00.000 --> 00:00:02.500]  Hello world." in f.getvalue()


def test_csv():
    f = io.StringIO()
    write_csv(_result(), f)
    lines = f.getvalue().strip().split("\n")
    assert lines[0] == "start_cs,end_cs,text"
    assert lines[1] == '0,250,"Hello world."'


def test_cli_parser():
    from whisper_tpu.cli.main import build_parser

    p = build_parser()
    a = p.parse_args(["-m", "model.bin", "-f", "a.wav", "-otxt", "-l", "de", "-tr"])
    assert a.model == "model.bin"
    assert a.file == ["a.wav"]
    assert a.language == "de"
    assert a.translate and a.output_txt
