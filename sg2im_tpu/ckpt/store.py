"""Native checkpoint store for train state (save/restore/resume).

TPU equivalent of the reference's monolithic ``torch.save`` dict
(``scripts/train.py:473-500,611-661``): the full GAN state (three models +
three optimizers + counters + RNG) round-trips, enabling preemption resume
(reference ``--restore_from_checkpoint``, ``train.py:446-471``).

Backends: Orbax (the TPU-native multi-host checkpointing library; opt-in
via ``backend='orbax'`` or SG2IM_TPU_CKPT=orbax) or flax-msgpack (default —
single-file, dependency-light).  Both live under the same directory layout:
``<path>/state.msgpack`` or ``<path>/state_orbax/`` plus ``<path>/meta.json``
(config/vocab/histories); ``load_checkpoint`` auto-detects which is present.
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


def _default_backend() -> str:
    return os.environ.get("SG2IM_TPU_CKPT", "msgpack")


def save_checkpoint(path: str, state, config=None, vocab=None, extra=None,
                    backend: str | None = None):
    backend = backend or _default_backend()
    os.makedirs(path, exist_ok=True)
    state = jax.tree.map(np.asarray, jax.device_get(state))
    # Remove the other representation so a later restore can't resurrect a
    # stale checkpoint written with a different backend.
    import shutil

    other_orbax = os.path.join(os.path.abspath(path), "state_orbax")
    other_msgpack = os.path.join(path, "state.msgpack")
    if backend == "orbax" and os.path.exists(other_msgpack):
        os.remove(other_msgpack)
    if backend != "orbax" and os.path.isdir(other_orbax):
        shutil.rmtree(other_orbax)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        target = os.path.join(os.path.abspath(path), "state_orbax")
        # StandardCheckpointer rejects scalar leaves; lift to 0-d arrays.
        arr_state = jax.tree.map(np.asarray, state)
        ckptr.save(target, arr_state, force=True)
        ckptr.wait_until_finished()
    else:
        from flax import serialization

        with open(os.path.join(path, "state.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(state))
    meta = {"config": config, "vocab": vocab, "extra": extra}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, default=_meta_default)


def load_checkpoint(path: str, template):
    """Restore a state saved by ``save_checkpoint``; ``template`` supplies
    the pytree structure (an initialized TrainState).  Auto-detects the
    backend from what is on disk."""
    orbax_path = os.path.join(os.path.abspath(path), "state_orbax")
    msgpack_path = os.path.join(path, "state.msgpack")
    if os.path.exists(orbax_path):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        arr_template = jax.tree.map(
            np.asarray, jax.device_get(template))
        state = ckptr.restore(orbax_path, arr_template)
        # Restore original leaf types (TrainState is a flax struct; leaves
        # come back as numpy arrays which jit happily consumes).
        state = jax.tree.map(lambda t, a: np.asarray(a, np.asarray(t).dtype),
                             arr_template, state)
        state = jax.tree.unflatten(jax.tree.structure(template),
                                   jax.tree.leaves(state))
    else:
        from flax import serialization

        with open(msgpack_path, "rb") as f:
            state = serialization.from_bytes(template, f.read())
    meta = {}
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta
