"""Golden end-to-end CLI output via a scripted checkpoint.

The reference's de-facto acceptance test is golden transcripts of SampleClips
(SURVEY §4.6). With no pretrained weights in this image, the equivalent is a
scripted checkpoint (tests/helpers.py:scripted_weights) whose greedy decode
deterministically emits a known token sequence — so the CLI's full path
(load -> mel -> encode -> window decode -> segment assembly -> writers) has
an exact expected output.
"""

import sys
import wave

import numpy as np
import pytest

BEG, EOT = 50_363, 50_256  # english-vocab specials (vocab.py:62-67)
SCRIPT = [BEG, 32, 104, 105, BEG + 96, EOT]  # <|0.00|> " hi" <|1.92|> <|eot|>


@pytest.fixture(scope="module")
def scripted(tmp_path_factory):
    from tests.helpers import make_scripted_checkpoint

    root = tmp_path_factory.mktemp("golden")
    model = str(root / "scripted.bin")
    make_scripted_checkpoint(model, SCRIPT)

    wav = str(root / "tone.wav")
    sr = 16_000
    t = np.arange(int(2.5 * sr)) / sr
    pcm = (0.2 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16)
    with wave.open(wav, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return model, wav, root


def _run_cli(args):
    from whisper_tpu.cli.main import main

    assert main(args) == 0


def test_cli_golden_transcript(scripted, capsys):
    model, wav, root = scripted
    _run_cli(["-m", model, "-f", wav, "-otxt", "-osrt", "-owts"])
    out = capsys.readouterr().out
    assert "[00:00:00.000 --> 00:00:01.920]" in out
    assert "hi" in out

    stem = wav.rsplit(".", 1)[0]
    assert open(stem + ".txt").read().strip() == "hi"
    srt = open(stem + ".srt").read()
    assert "00:00:00,000 --> 00:00:01,920" in srt and "hi" in srt

    wts = open(wav + ".wts").read()
    assert wts.startswith("#!/bin/bash")
    # background text + per-token highlight windows from real token timestamps
    assert "text='>  hi'" in wts
    assert "between(t,0.0,1.92)" in wts
    assert "-c:v libx264" in wts


def test_cli_golden_speedup_doubles_times(scripted, capsys):
    model, wav, _ = scripted
    _run_cli(["-m", model, "-f", wav, "-su"])
    out = capsys.readouterr().out
    # scripted decode always says 1.92 s; SpeedupAudio scales times 2x
    assert "[00:00:00.000 --> 00:00:03.840]" in out


def test_scripted_decode_via_api(scripted):
    """The scripted fixture itself: greedy decode emits exactly SCRIPT."""
    from whisper_tpu.api.model import Model
    from whisper_tpu.api.params import Flags, FullParams
    from whisper_tpu.model.params import DtypePolicy

    model, wav, _ = scripted
    m = Model(model, policy=DtypePolicy.f32())
    ctx = m.create_context()
    audio = np.zeros(16_000 * 2, np.float32)  # decode ignores the audio
    res = ctx.run_full(FullParams(language="en", flags=Flags.TOKEN_TIMESTAMPS), audio)
    assert len(res.segments) == 1
    seg = res.segments[0]
    assert seg.text == " hi"
    assert (seg.t0, seg.t1) == (0, 192)
    assert [t.id for t in seg.tokens][:4] == [BEG, 32, 104, 105]
