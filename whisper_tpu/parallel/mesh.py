"""Device mesh construction.

The reference is single-GPU (SURVEY.md §2.10); parallelism here is
first-class: a 2-D ("data", "model") mesh where

  - "data"  — utterances / 30 s windows / beams batch axis (DP); spans hosts
              (DCN) in multi-host deployments
  - "model" — tensor parallelism for large checkpoints: attention heads,
              MLP hidden dim, and the vocab-sharded logits matmul ride ICI

XLA GSPMD inserts the psum/all-gather collectives implied by the
NamedShardings (the NCCL-equivalent is the compiler, SURVEY.md §2.10).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_model: int = 1, devices=None) -> Mesh:
    """Mesh over all (or given) devices with a model-parallel minor axis.

    ``n_model`` chips cooperate on one model replica; the remaining factor is
    the data axis. The model axis is minor (fastest-varying) so TP collectives
    ride neighboring ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % n_model:
        raise ValueError(f"{n} devices not divisible by n_model={n_model}")
    arr = np.array(devices).reshape(n // n_model, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
