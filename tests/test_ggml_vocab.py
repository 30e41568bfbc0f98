"""GGML round-trip, vocabulary, and language-table tests."""

import numpy as np
import pytest

from tests.helpers import TINY_TEST_DIMS, make_random_checkpoint, make_vocab_words
from whisper_tpu.ggml import load_checkpoint
from whisper_tpu.languages import find_language_id, language_code, supported_languages
from whisper_tpu.vocab import Vocabulary


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ggml") / "tiny-test.bin")
    weights = make_random_checkpoint(path, TINY_TEST_DIMS, seed=0)
    return path, weights


def test_roundtrip(ckpt):
    path, weights = ckpt
    seen = []
    cp = load_checkpoint(path, progress=seen.append)
    assert cp.dims == TINY_TEST_DIMS
    assert cp.filters.data.shape == (80, 201)
    assert set(cp.tensors) == set(weights)
    assert seen and seen[-1] == pytest.approx(1.0)
    # f16 quantization error only for >=2-D tensors; 1-D stay exact f32
    for name, ref in weights.items():
        got = cp.tensors[name].data.astype(np.float32)
        assert got.shape == ref.shape, name
        tol = 2e-3 if ref.ndim >= 2 else 0.0
        assert np.max(np.abs(got - ref)) <= tol, name
    # ne order is reversed numpy shape
    t = cp.tensors["encoder.conv1.weight"]
    assert t.ne == (3, TINY_TEST_DIMS.n_mels, TINY_TEST_DIMS.n_audio_state)


def test_vocab_specials_english():
    v = Vocabulary(make_vocab_words(51_864), 51_864)
    assert (v.token_eot, v.token_sot, v.token_beg) == (50_256, 50_257, 50_363)
    assert not v.multilingual
    assert len(v) == 51_864
    assert v.bytes(v.token_beg) == b"[_BEG_]"
    assert v.bytes(v.token_beg + 50) == b"[_TT_50]"
    assert v.bytes(v.token_eot) == b"[_EOT_]"


def test_vocab_specials_multilingual():
    v = Vocabulary(make_vocab_words(51_865), 51_865)
    assert v.multilingual
    assert (v.token_eot, v.token_sot, v.token_beg) == (50_257, 50_258, 50_364)
    assert (v.token_translate, v.token_transcribe) == (50_358, 50_359)


def test_tokenize_roundtrip():
    v = Vocabulary(make_vocab_words(51_864), 51_864)
    ids = v.tokenize("hello world")
    assert ids, "tokenizer produced nothing"
    assert v.decode_text(ids) == "hello world"


def test_timestamp_tokens():
    v = Vocabulary(make_vocab_words(51_864), 51_864)
    assert v.timestamp_token(0.0) == v.token_beg
    assert v.timestamp_token(1.0) == v.token_beg + 50
    assert v.timestamp_seconds(v.token_beg + 100) == pytest.approx(2.0)


def test_languages():
    assert find_language_id("en") == 0
    assert find_language_id("english") == 0
    assert find_language_id("de") == 2
    assert find_language_id("xx") == -1
    assert language_code(1) == "zh"
    assert len(supported_languages()) == 100  # 99 classic + yue (v3 family)
    assert find_language_id("yue") == 99


def test_f32_checkpoint_roundtrip(tmp_path):
    """ftype=0 checkpoints (no f16) load exactly."""
    from tests.helpers import TINY_TEST_DIMS, make_random_checkpoint
    from whisper_tpu.ggml import load_checkpoint

    path = str(tmp_path / "f32.bin")
    weights = make_random_checkpoint(path, TINY_TEST_DIMS, seed=2, use_f16=False)
    cp = load_checkpoint(path)
    assert cp.dims.ftype == 0
    for name, ref in weights.items():
        np.testing.assert_array_equal(cp.tensors[name].data, ref)


def test_loader_reshapes_alternate_bias_layout(tmp_path):
    """Real whisper.cpp files store conv biases as [n, 1] 2-D tensors; the
    param builder reshapes by element count (WhisperModel.cpp accepts any
    dims whose product matches)."""
    from tests.helpers import TINY_TEST_DIMS, make_random_checkpoint
    from whisper_tpu.ggml import load_checkpoint
    from whisper_tpu.model.params import DtypePolicy, params_from_checkpoint

    path = str(tmp_path / "alt.bin")
    make_random_checkpoint(path, TINY_TEST_DIMS, seed=3)
    cp = load_checkpoint(path)
    # simulate the 2-D bias layout
    for name in ("encoder.conv1.bias", "encoder.conv2.bias"):
        t = cp.tensors[name]
        t.data = t.data.reshape(-1, 1)
    params = params_from_checkpoint(cp, DtypePolicy.f32())
    assert params["enc"]["conv1_b"].shape == (TINY_TEST_DIMS.n_audio_state,)


def test_missing_tensor_raises(tmp_path):
    from tests.helpers import TINY_TEST_DIMS, make_random_checkpoint
    from whisper_tpu.ggml import load_checkpoint
    from whisper_tpu.model.params import DtypePolicy, params_from_checkpoint

    path = str(tmp_path / "m.bin")
    make_random_checkpoint(path, TINY_TEST_DIMS, seed=4)
    cp = load_checkpoint(path)
    del cp.tensors["decoder.ln.weight"]
    with pytest.raises(ValueError, match="decoder.ln.weight"):
        params_from_checkpoint(cp, DtypePolicy.f32())


def test_truncated_file_raises(tmp_path):
    from tests.helpers import TINY_TEST_DIMS, make_random_checkpoint
    from whisper_tpu.ggml import load_checkpoint

    path = str(tmp_path / "t.bin")
    make_random_checkpoint(path, TINY_TEST_DIMS, seed=5)
    data = open(path, "rb").read()
    trunc = str(tmp_path / "trunc.bin")
    open(trunc, "wb").write(data[: len(data) - 1000])
    with pytest.raises((EOFError, ValueError)):
        load_checkpoint(trunc)


def test_bad_magic_raises(tmp_path):
    from whisper_tpu.ggml import load_checkpoint

    path = str(tmp_path / "bad.bin")
    open(path, "wb").write(b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        load_checkpoint(path)


def test_v3_vocab_special_ids():
    """large-v3 layout (n_vocab=51866, 100 languages): every post-language
    special shifts +1 vs v2; eot/sot do not (openai v3 tokenizer layout)."""
    from whisper_tpu.vocab import Vocabulary

    v2 = Vocabulary([], 51_865)
    assert (v2.token_eot, v2.token_sot) == (50_257, 50_258)
    assert (v2.token_translate, v2.token_transcribe) == (50_358, 50_359)
    assert (v2.token_prev, v2.token_solm, v2.token_not, v2.token_beg) == (
        50_361, 50_362, 50_363, 50_364)  # reference Vocabulary.cpp:110-121
    assert v2.num_languages == 99

    v3 = Vocabulary([], 51_866)
    assert (v3.token_eot, v3.token_sot) == (50_257, 50_258)
    assert (v3.token_translate, v3.token_transcribe) == (50_359, 50_360)
    assert (v3.token_prev, v3.token_solm, v3.token_not, v3.token_beg) == (
        50_362, 50_363, 50_364, 50_365)
    assert v3.num_languages == 100
    # 1500 timestamp tokens still fit: beg + 1500 == 51865 == n_vocab - 1
    assert v3.token_beg + 1500 == v3.n_vocab - 1

    en = Vocabulary([], 51_864)
    assert (en.token_eot, en.token_beg) == (50_256, 50_363)
    assert en.num_languages == 99


def test_v3_model_dims_catalog():
    from whisper_tpu.hparams import KNOWN_MODELS

    v3 = KNOWN_MODELS["large-v3"]
    assert (v3.n_vocab, v3.n_mels, v3.n_text_layer) == (51_866, 128, 32)
    turbo = KNOWN_MODELS["large-v3-turbo"]
    assert (turbo.n_vocab, turbo.n_mels) == (51_866, 128)
    assert (turbo.n_audio_layer, turbo.n_text_layer) == (32, 4)
