"""Tracing, NaN debug, profiler, and tools tests."""

import numpy as np


def test_trace_write_and_compare(tmp_path):
    from whisper_tpu.obs.trace import TraceWriter, compare_traces, print_compare

    a = TraceWriter(str(tmp_path / "a"))
    b = TraceWriter(str(tmp_path / "b"))
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    a.tensor("enc.q", x)
    a.tensor("enc.q", x + 1)  # repeated name -> slot #1
    a.tensor("dec.logits", x * 2)
    b.tensor("enc.q", x)
    b.tensor("enc.q", x + 1.5)
    b.tensor("dec.logits", x * 2)

    diffs = compare_traces(str(tmp_path / "a"), str(tmp_path / "b"))
    by_name = {d.name: d for d in diffs}
    assert by_name["enc.q"].max_abs_diff == 0.0
    assert abs(by_name["enc.q#1"].max_abs_diff - 0.5) < 1e-6
    assert by_name["dec.logits"].max_abs_diff == 0.0
    assert "maxAbsDiff" in print_compare(diffs)


def test_traced_inside_jit(tmp_path):
    import jax
    import jax.numpy as jnp

    from whisper_tpu.obs.trace import TraceWriter, traced

    tracer = TraceWriter(str(tmp_path / "t"))

    @jax.jit
    def f(x):
        y = traced(tracer, "mid", x * 2)
        return y + 1

    out = f(jnp.ones((4,)))
    jax.block_until_ready(out)
    jax.effects_barrier()
    diffs_path = tmp_path / "t" / "mid.npy"
    assert diffs_path.exists()
    np.testing.assert_allclose(np.load(diffs_path), 2 * np.ones((4,)))


def test_check_pytree_finite():
    import pytest

    from whisper_tpu.obs.nandebug import check_pytree_finite

    ok = {"a": np.ones(3), "b": {"c": np.zeros(2)}}
    check_pytree_finite(ok)
    bad = {"a": np.array([1.0, np.nan])}
    with pytest.raises(FloatingPointError):
        check_pytree_finite(bad)


def test_profiler_report():
    import time

    from whisper_tpu.obs.profiler import Profiler

    p = Profiler()
    with p.cpu("encode"):
        time.sleep(0.01)
    with p.cpu("encode"):
        pass
    p.note_memory("weights", 123.4)
    r = p.report()
    assert "encode" in r and "2 calls" in r and "123.4" in r
    assert p.get("encode") >= 0.01


def test_perf_summary_tool(tmp_path, capsys):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import perf_summary

    f = tmp_path / "BENCH_r1.json"
    f.write_text('{"metric": "rtf", "value": 35.3, "unit": "audio_s/s", "vs_baseline": 4.9}\n')
    old = sys.argv
    sys.argv = ["perf_summary.py", str(f)]
    try:
        perf_summary.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out
    assert "rtf\t35.3" in out
