"""Benchmark: audio-seconds transcribed per second per chip.

Runs the full pipeline (mel -> encode -> on-device window decode) on the
real TPU with synthetic large-v2-sized weights (no pretrained checkpoints in
this image) and a deterministic decode workload of DECODE_TOKENS tokens per
30 s window (``force_steps`` — random weights would otherwise make the
token count nondeterministic).

Primary metric (BASELINE.json's): BATCHED audio_s/s/chip at BENCH_BATCH
utterance lanes — the serving-throughput number. Single-stream RTF is
reported alongside on stderr.

Tier: the SERVING config by default (Pallas decode kernels + int8 KV caches
+ int8 decoder weights — token parity vs the bf16 reference path is covered
by tests/test_kernels.py::test_decode_window_int8_kv_matches_reference_tokens
and tests/test_quant_weights.py). ``BENCH_KERNELS=auto|reference`` selects
the bf16 tiers instead. The resolved kernel config and dtype policy are
ALWAYS logged so the measured path is never ambiguous (round-2 lesson:
a platform-name check silently disabled Pallas on the bench chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio_s/s", "vs_baseline": N}

Baseline: the reference's best published large-model RTF, 7.22 on a GTX
1080 Ti (columbia.wma, SampleClips/summary.tsv:14; BASELINE.md). Target from
BASELINE.json: RTF >= 10 on large-v2 per chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

MODEL = os.environ.get("BENCH_MODEL", "large-v2")
DECODE_TOKENS = int(os.environ.get("BENCH_DECODE_TOKENS", "128"))
WINDOWS = int(os.environ.get("BENCH_WINDOWS", "4"))
BATCH = int(os.environ.get("BENCH_BATCH", "8"))  # primary-metric lane count
TIER = os.environ.get("BENCH_KERNELS", "serving")
BASELINE_RTF = 7.22  # reference large on 1080 Ti


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from whisper_tpu.config import KernelConfig
    from whisper_tpu.features import LogMelSpectrogram, mel_filter_bank
    from whisper_tpu.hparams import KNOWN_MODELS, N_FRAMES
    from whisper_tpu.runtime.context import WhisperRuntime
    from whisper_tpu.runtime.sampler import SpecialIds
    from whisper_tpu.tools.synthetic import make_synthetic_params

    dims = KNOWN_MODELS[MODEL]
    d0 = jax.devices()[0]
    log(
        f"bench model={MODEL} devices={jax.devices()} "
        f"platform={d0.platform} kind={getattr(d0, 'device_kind', '?')} "
        f"default_backend={jax.default_backend()}"
    )

    kernels = {
        "serving": KernelConfig.serving,
        "auto": KernelConfig.auto,
        "reference": KernelConfig.reference,
    }[TIER]()
    weights_int8 = TIER == "serving" and kernels.flash_attention
    log(
        f"tier={TIER} kernels={kernels.describe()} "
        f"dtype_policy={'serving(int8 decoder weights)' if weights_int8 else 'bf16'}"
    )

    t0 = time.perf_counter()
    params = make_synthetic_params(dims, jnp.bfloat16, weights_int8=weights_int8)
    jax.block_until_ready(params)
    log(f"params built on device in {time.perf_counter()-t0:.1f}s")

    shift = 1 if dims.n_vocab >= 51_865 else 0
    ids = SpecialIds(
        eot=50_256 + shift, sot=50_257 + shift, prev=50_360 + shift,
        solm=50_361 + shift, not_=50_362 + shift, beg=50_363 + shift,
    )
    rt = WhisperRuntime(params, dims, ids, compute_dtype=jnp.bfloat16, kernels=kernels)

    # synthetic audio: WINDOWS x 30 s
    audio_s = 30 * WINDOWS
    t = np.arange(16_000 * audio_s) / 16_000.0
    rng = np.random.default_rng(0)
    audio = (0.3 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.standard_normal(t.shape)).astype(
        np.float32
    )

    mel_engine = LogMelSpectrogram(mel_filter_bank(dims.n_mels))
    prompt = [ids.sot] + ([ids.sot + 1, 50_359] if shift else [])
    cap = rt.prompt_capacity
    padded = np.zeros((1, cap), np.int32)
    padded[0, : len(prompt)] = prompt
    plen = np.full((1,), len(prompt), np.int32)
    seek_end = np.full((1,), 10**7, np.int32)

    def run_once(measure: bool):
        t_mel = time.perf_counter()
        mel = np.asarray(mel_engine(audio))
        n_len = mel.shape[1]
        mel_pad = np.zeros((mel.shape[0], n_len + N_FRAMES), np.float32)
        mel_pad[:, :n_len] = mel
        t_enc = t_dec = 0.0
        windows = 0
        for seek in range(0, n_len - 1, N_FRAMES):
            t1 = time.perf_counter()
            _, cross = rt.encode_window(mel_pad[None, :, seek : seek + N_FRAMES])
            jax.block_until_ready(cross)
            t2 = time.perf_counter()
            res = rt.run_window(
                padded, plen, cross,
                np.full((1,), seek, np.int32), seek_end,
                force_steps=DECODE_TOKENS,
            )
            jax.block_until_ready(res.tokens)
            t3 = time.perf_counter()
            t_enc += t2 - t1
            t_dec += t3 - t2
            windows += 1
        total = time.perf_counter() - t_mel
        if measure:
            log(
                f"single-stream: windows={windows} mel={total-t_enc-t_dec:.2f}s "
                f"encode={t_enc:.2f}s decode={t_dec:.2f}s total={total:.2f}s "
                f"({DECODE_TOKENS} tok/window, "
                f"{t_dec*1e3/(windows*DECODE_TOKENS):.2f} ms/token-step)"
            )
        return total

    log("warmup/compile ...")
    t0 = time.perf_counter()
    run_once(measure=False)
    log(f"warmup done in {time.perf_counter()-t0:.1f}s")

    best = min(run_once(measure=True) for _ in range(2))
    rtf_single = audio_s / best
    log(f"single-stream RTF: {rtf_single:.1f} audio_s/s (x{rtf_single/BASELINE_RTF:.2f} baseline)")

    # primary: batched serving throughput (BATCH 30 s windows per dispatch,
    # mel on host overlapped-free — counted in the round time)
    bp = np.tile(padded, (BATCH, 1))
    bl = np.tile(plen, BATCH)
    bseek = np.zeros((BATCH,), np.int32)
    bend = np.full((BATCH,), 10**7, np.int32)

    def batched_round():
        mel = np.asarray(mel_engine(audio[: 16_000 * 30]))
        mel_b = np.tile(mel[None, :, :N_FRAMES], (BATCH, 1, 1))
        _, cross = rt.encode_window(mel_b)
        res = rt.run_window(bp, bl, cross, bseek, bend, force_steps=DECODE_TOKENS)
        jax.block_until_ready(res.tokens)

    batched_round()  # compile
    t1 = time.perf_counter()
    rounds = 3
    for _ in range(rounds):
        batched_round()
    dt = (time.perf_counter() - t1) / rounds
    rtf_batched = 30 * BATCH / dt
    log(
        f"batched throughput: batch={BATCH}, {rtf_batched:.1f} audio_s/s "
        f"({dt*1e3:.0f} ms/round, {dt*1e3/DECODE_TOKENS:.2f} ms/token-step)"
    )
    print(
        json.dumps(
            {
                "metric": f"batched_b{BATCH}_{MODEL.replace('-', '_')}_{TIER}_{DECODE_TOKENS}tok",
                "value": round(rtf_batched, 3),
                "unit": "audio_s/s",
                "vs_baseline": round(rtf_batched / BASELINE_RTF, 3),
                "single_stream_rtf": round(rtf_single, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
