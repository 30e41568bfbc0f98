"""Phase profiler + timings report.

The analogue of the reference's ProfileCollection / CpuProfiler / GpuProfiler
(Whisper/Utils/ProfileCollection.h:15-54, GpuProfiler.h:37-70) and the
``timingsPrint`` report (ContextImpl.misc.cpp:170-188). Blocks carry the
reference's phase taxonomy (LoadModel, Run, Spectrogram, Encode, Decode,
Callbacks, ...); device work is measured by wall clock around blocking calls
(XLA async dispatch means fine-grained device timing comes from
``jax.profiler`` traces — see ``whisper_tpu.obs.trace``).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import OrderedDict


@dataclasses.dataclass
class _Entry:
    calls: int = 0
    total_s: float = 0.0


class Profiler:
    def __init__(self):
        self._cpu: "OrderedDict[str, _Entry]" = OrderedDict()
        self._mem_notes: dict[str, float] = {}

    def reset(self) -> None:
        self._cpu.clear()
        self._mem_notes.clear()

    @contextlib.contextmanager
    def cpu(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            e = self._cpu.setdefault(name, _Entry())
            e.calls += 1
            e.total_s += time.perf_counter() - t0

    def note_memory(self, name: str, mb: float) -> None:
        self._mem_notes[name] = mb

    def add(self, name: str, seconds: float, calls: int = 1) -> None:
        e = self._cpu.setdefault(name, _Entry())
        e.calls += calls
        e.total_s += seconds

    def get(self, name: str) -> float:
        e = self._cpu.get(name)
        return e.total_s if e else 0.0

    def report(self) -> str:
        lines = ["host phases:"]
        for name, e in self._cpu.items():
            avg = e.total_s / max(1, e.calls)
            lines.append(
                f"  {name:<14} {e.calls:>6} calls, {e.total_s*1e3:10.2f} ms total, "
                f"{avg*1e3:10.3f} ms avg"
            )
        if self._mem_notes:
            lines.append("memory:")
            for name, mb in self._mem_notes.items():
                lines.append(f"  {name:<14} {mb:10.1f} MB")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace scope — the RenderDoc/GPU-timestamp analogue
    (SURVEY.md §5.1). View with tensorboard or xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """HBM usage per device (getMemoryUse analogue)."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use", 0),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
            }
    return out
