"""Beam-search window decode (BASELINE.json config 3).

The reference declares BeamSearch but never implements it
(sFullParams.h:12-13); this is a from-scratch on-device implementation:
beams are lanes of the batch dimension sharing one KV cache tensor
(placeholder — implemented in runtime/beam, round 1 scope: greedy first).
"""

from __future__ import annotations


def decode_window_beam(runtime, params, prompt, prompt_len, cross_kv, seek, seek_end):
    raise NotImplementedError("beam search lands after the greedy path is solid")
