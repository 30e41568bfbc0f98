"""Driver feature coverage: multilingual prompts, context carry-over,
audio_ctx override, streamed path, logger, devices."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ml_model(tmp_path_factory):
    from tests.helpers import MULTILINGUAL_TEST_DIMS, make_random_checkpoint
    from whisper_tpu.api.model import Model
    from whisper_tpu.model.params import DtypePolicy

    path = str(tmp_path_factory.mktemp("ml") / "ml.bin")
    make_random_checkpoint(path, MULTILINGUAL_TEST_DIMS, seed=50)
    return Model(path, policy=DtypePolicy.f32())


def test_multilingual_prompt_head(ml_model):
    from whisper_tpu.api.params import Flags, FullParams

    ctx = ml_model.create_context()
    v = ml_model.vocab
    p = ctx.build_prompt_init(FullParams(language="de"))
    assert p == [v.token_sot, v.token_sot + 1 + 2, v.token_transcribe]
    p = ctx.build_prompt_init(FullParams(language="ja", flags=Flags.TRANSLATE))
    assert p == [v.token_sot, v.token_sot + 1 + 7, v.token_translate]
    with pytest.raises(ValueError):
        ctx.build_prompt_init(FullParams(language="zz"))


def test_english_model_prompt_head(tmp_path):
    from tests.helpers import TINY_TEST_DIMS, make_random_checkpoint
    from whisper_tpu.api.model import Model
    from whisper_tpu.api.params import FullParams
    from whisper_tpu.model.params import DtypePolicy

    path = str(tmp_path / "en.bin")
    make_random_checkpoint(path, TINY_TEST_DIMS, seed=51)
    m = Model(path, policy=DtypePolicy.f32())
    ctx = m.create_context()
    assert ctx.build_prompt_init(FullParams(language="en")) == [m.vocab.token_sot]


def test_prompt_carry_over_and_no_context(ml_model):
    from whisper_tpu.api.params import Flags, FullParams

    ctx = ml_model.create_context()
    ctx.prompt_past = [11, 22, 33]
    prompt = ctx._build_prompt(FullParams(language="en"), [ml_model.vocab.token_sot])
    assert prompt[0] == ml_model.vocab.token_prev
    assert prompt[1:4] == [11, 22, 33]

    # NoContext clears carry-over inside run_full
    rng = np.random.default_rng(0)
    audio = (0.05 * rng.standard_normal(16_000 * 4)).astype(np.float32)
    params = FullParams(language="en", flags=Flags.NO_CONTEXT)
    ctx.prompt_past = [1, 2, 3]
    ctx.run_full(params, audio)
    # whatever was decoded, the preset past must have been dropped
    assert 1 not in ctx.prompt_past[:1]


def test_initial_prompt_tokens(ml_model):
    from whisper_tpu.api.params import FullParams

    rng = np.random.default_rng(1)
    audio = (0.05 * rng.standard_normal(16_000 * 4)).astype(np.float32)
    ctx = ml_model.create_context()
    params = FullParams(language="en", prompt_tokens=[7, 8, 9])
    ctx.run_full(params, audio)  # must not raise; tokens prepended to past


def test_audio_ctx_override(ml_model):
    from whisper_tpu.api.params import FullParams

    rng = np.random.default_rng(2)
    audio = (0.05 * rng.standard_normal(16_000 * 4)).astype(np.float32)
    ctx = ml_model.create_context()
    res = ctx.run_full(FullParams(language="en", audio_ctx=48), audio)
    assert isinstance(res.segments, list)
    with pytest.raises(ValueError):
        ctx.run_full(FullParams(language="en", audio_ctx=10_000), audio)


def test_run_streamed_matches_reference_mode(ml_model):
    """Streamed path smoke: chunked reader -> MelStreamer -> same driver."""
    from whisper_tpu.api.params import FullParams
    from whisper_tpu.audio.load import ChunkedReader

    rng = np.random.default_rng(3)
    audio = (0.05 * rng.standard_normal(16_000 * 4)).astype(np.float32)
    ctx = ml_model.create_context()
    res = ctx.run_streamed(FullParams(language="en"), ChunkedReader(audio))
    assert isinstance(res.segments, list)


def test_logger_sink():
    from whisper_tpu.obs.logging import LogLevel, logger, setup_logger

    seen = []
    setup_logger(LogLevel.DEBUG, sink=lambda lvl, msg: seen.append((lvl, msg)))
    logger.debug("hello %s", "world")
    logger.error("boom")
    assert (int(LogLevel.DEBUG), "hello world") in seen
    assert (int(LogLevel.ERROR), "boom") in seen


def test_list_devices():
    from whisper_tpu.api.devices import list_devices

    devs = list_devices()
    assert len(devs) == 8  # virtual CPU mesh from conftest
    assert all(d.platform == "cpu" for d in devs)


def test_speedup_2x_decimation():
    from whisper_tpu.audio.load import speedup_2x

    x = np.arange(10, dtype=np.float32)
    y = speedup_2x(x)
    assert y.shape == (5,)
    np.testing.assert_allclose(y, [0.5, 2.5, 4.5, 6.5, 8.5])
    # odd length drops the trailing sample
    assert speedup_2x(np.arange(7, dtype=np.float32)).shape == (3,)


def test_speedup_audio_flag_runs_and_scales_times(ml_model):
    from whisper_tpu.api.params import Flags, FullParams

    rng = np.random.default_rng(7)
    audio = (0.05 * rng.standard_normal(16_000 * 4)).astype(np.float32)

    ctx = ml_model.create_context()
    res = ctx.run_full(FullParams(language="en", flags=Flags.SPEEDUP_AUDIO), audio)
    # decode ran on 2 s of compressed audio; all times are even (2x-scaled
    # centisecond grid) and within the REAL clip duration
    for seg in res.segments:
        assert seg.t0 % 2 == 0 and seg.t1 % 2 == 0
        assert 0 <= seg.t0 <= seg.t1 <= 400 + 3000  # window slack


def test_v3_family_end_to_end(tmp_path):
    """128-mel / 51866-vocab (large-v3 layout) model runs the full pipeline
    and accepts the v3-only language "yue"."""
    import dataclasses

    from tests.helpers import MULTILINGUAL_TEST_DIMS, make_random_checkpoint
    from whisper_tpu.api.model import Model
    from whisper_tpu.api.params import FullParams
    from whisper_tpu.model.params import DtypePolicy

    dims = dataclasses.replace(MULTILINGUAL_TEST_DIMS, n_vocab=51_866, n_mels=128)
    path = str(tmp_path / "v3mini.bin")
    make_random_checkpoint(path, dims, seed=60)
    m = Model(path, policy=DtypePolicy.f32())
    assert m.vocab.num_languages == 100

    ctx = m.create_context()
    v = m.vocab
    p = ctx.build_prompt_init(FullParams(language="yue"))
    assert p == [v.token_sot, v.token_sot + 1 + 99, v.token_transcribe]

    rng = np.random.default_rng(1)
    audio = (0.05 * rng.standard_normal(16_000 * 3)).astype(np.float32)
    mel = np.asarray(m.mel(audio))
    assert mel.shape[0] == 128
    ctx.run_full(FullParams(language="en"), audio)  # full pipeline executes


def test_v2_model_rejects_yue(ml_model):
    from whisper_tpu.api.params import FullParams

    ctx = ml_model.create_context()
    with pytest.raises(ValueError, match="large-v3"):
        ctx.build_prompt_init(FullParams(language="yue"))
