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


def test_wts():
    from whisper_tpu.api.result import Token, TokenFlags
    from whisper_tpu.cli.writers import write_wts

    res = TranscribeResult(
        segments=[
            Segment(
                text=" Hello world's",
                t0=0,
                t1=250,
                tokens=[
                    Token(id=1, text=" Hello", t0=0, t1=100, probability=0.9),
                    Token(id=2, text=" world's", t0=100, t1=250, probability=0.8),
                    Token(id=50257, text="<|eot|>", t0=250, t1=250,
                          flags=TokenFlags.SPECIAL),
                ],
            )
        ]
    )
    f = io.StringIO()
    write_wts(res, f, "jfk.wav", 11.0)
    out = f.getvalue()
    assert out.startswith("#!/bin/bash\n")
    assert "ffmpeg -i jfk.wav" in out
    assert "duration=11.0" in out
    # background text: full segment, apostrophe escaped for drawtext
    assert "text='>  Hello world’s'" in out  # token texts concatenated verbatim
    # per-token highlight windows
    assert "between(t,0.0,1.0)" in out and "between(t,1.0,2.5)" in out
    # specials are never drawn
    assert "eot" not in out
    # underline row for the first token: blanks then underscores
    assert "_" * len(" Hello") in out
    assert out.rstrip().endswith('echo "  ffplay jfk.wav.mp4"')


def test_wts_cli_flag_defaults_max_len():
    from whisper_tpu.cli.main import build_parser

    a = build_parser().parse_args(["-m", "m.bin", "-f", "a.wav", "-owts"])
    assert a.output_words and a.max_len == 0
