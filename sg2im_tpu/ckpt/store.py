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


def _to_host(x):
    """Device leaf -> numpy.  Under multi-host the train state is fully
    replicated, so any process can materialize it from a local shard (a
    plain ``device_get`` rejects non-fully-addressable global arrays)."""
    if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
        return np.asarray(x.addressable_data(0))
    return np.asarray(x)


# -- async save machinery ----------------------------------------------------
# ``save_checkpoint(..., wait=False)`` returns once the state is safely
# materialized OFF the device buffers (host numpy for msgpack; Orbax's own
# async staging for orbax) and completes the disk write in the background —
# training's next step can donate the state buffers immediately.  A later
# save, any load, and wait_pending() all join the outstanding write first.
_pending_write = None  # _WriterThread | "orbax" | None
_orbax_ckptr = None    # long-lived StandardCheckpointer for async saves
_atexit_registered = False


def _wait_pending_at_exit():  # pragma: no cover — interpreter shutdown
    try:
        wait_pending()
    except Exception as e:  # noqa: BLE001 — exit path: report, don't mask
        print(f"WARNING: async checkpoint write failed at exit: {e!r}")


def wait_pending():
    """Block until any in-flight async checkpoint write has finished.
    Re-raises the background writer's exception (a failed async save must
    not masquerade as success)."""
    global _pending_write
    if _pending_write is None:
        return
    pending, _pending_write = _pending_write, None
    if pending == "orbax":
        if _orbax_ckptr is not None:
            _orbax_ckptr.wait_until_finished()
        return
    pending.join()
    if pending.error is not None:
        raise pending.error


class _WriterThread:
    """Daemon thread wrapper that captures the write fn's exception."""

    def __init__(self, fn):
        import threading

        self.error: BaseException | None = None

        def run():
            try:
                fn()
            except BaseException as e:  # noqa: BLE001 — re-raised in join
                self.error = e

        self._t = threading.Thread(target=run, daemon=True)
        self._t.start()

    def join(self):
        self._t.join()


def save_checkpoint(path: str, state, config=None, vocab=None, extra=None,
                    backend: str | None = None, arrays=None,
                    wait: bool = True):
    """``arrays`` is an optional pytree of numpy arrays (sample/batch-data
    histories, reference ``train.py:611-661``) written to a msgpack sidecar
    — too large for meta.json, not part of the resumable train state.

    Multi-host: with the msgpack backend only process 0 writes (state is
    replicated); the Orbax backend saves collectively from all processes.

    ``wait=False`` overlaps the disk write with training (see
    :func:`wait_pending`); the state is materialized off the device
    buffers before returning either way, so donation stays safe.
    """
    global _pending_write, _orbax_ckptr
    wait_pending()  # one in-flight write at a time; also orders saves
    backend = backend or _default_backend()
    proc0 = jax.process_index() == 0
    if proc0:
        os.makedirs(path, exist_ok=True)
    if backend != "orbax":
        if not proc0:
            return
        state = jax.tree.map(_to_host, state)
    # Remove the other representation so a later restore can't resurrect a
    # stale checkpoint written with a different backend.
    import shutil

    other_orbax = os.path.join(os.path.abspath(path), "state_orbax")
    other_msgpack = os.path.join(path, "state.msgpack")
    if proc0 and backend == "orbax" and os.path.exists(other_msgpack):
        os.remove(other_msgpack)
    if proc0 and backend != "orbax" and os.path.isdir(other_orbax):
        shutil.rmtree(other_orbax)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        if _orbax_ckptr is None:
            _orbax_ckptr = ocp.StandardCheckpointer()
        ckptr = _orbax_ckptr
        target = os.path.join(os.path.abspath(path), "state_orbax")
        # StandardCheckpointer rejects scalar leaves; lift to 0-d arrays.
        # Non-addressable (multi-host) jax.Arrays are passed through — Orbax
        # gathers them collectively across processes.
        arr_state = jax.tree.map(
            lambda x: x if (hasattr(x, "is_fully_addressable")
                            and not x.is_fully_addressable)
            else np.asarray(x), state)
        ckptr.save(target, arr_state, force=True)
        # Multi-host leaves are passed through as live jax.Arrays that
        # Orbax gathers DURING the write — returning early would let the
        # next train step donate those buffers out from under it, so
        # async applies only when every leaf was copied to host above.
        device_leaves = any(
            hasattr(x, "is_fully_addressable") and not x.is_fully_addressable
            for x in jax.tree.leaves(state))
        if wait or device_leaves:
            ckptr.wait_until_finished()
        else:
            _pending_write = "orbax"
        if proc0:
            _write_meta(path, config, vocab, extra, arrays)
        return

    from flax import serialization

    def write_all(host_state=state):
        # tmp + atomic replace: a crash mid-write (or a reader racing
        # an async write) sees the previous complete checkpoint, never
        # a torso.  meta.json/history.msgpack follow the state replace
        # (same ordering as a synchronous save), so a preemption can
        # never leave NEW histories next to an OLD state — the resume
        # counters and histories always belong to the same save or an
        # earlier one.
        final = os.path.join(path, "state.msgpack")
        tmp = final + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(host_state))
        os.replace(tmp, final)
        _write_meta(path, config, vocab, extra, arrays)

    if not proc0:
        return
    if wait:
        write_all()
    else:
        # Serialization + disk I/O (incl. the growing history sidecar)
        # all leave the training critical path.  atexit joins the writer
        # on ANY interpreter exit (uncaught exception, Ctrl-C, sys.exit)
        # — daemon threads are otherwise killed mid-write and the last
        # announced checkpoint would silently be the previous one.
        global _atexit_registered
        if not _atexit_registered:
            import atexit

            atexit.register(_wait_pending_at_exit)
            _atexit_registered = True
        _pending_write = _WriterThread(write_all)


def _write_meta(path, config, vocab, extra, arrays):
    meta = {"config": config, "vocab": vocab, "extra": extra}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, default=_meta_default)
    if arrays is not None:
        from flax import serialization

        data = serialization.msgpack_serialize(
            jax.tree.map(np.asarray, arrays))
        with open(os.path.join(path, "history.msgpack"), "wb") as f:
            f.write(data)


def load_checkpoint(path: str, template):
    """Restore a state saved by ``save_checkpoint``; ``template`` supplies
    the pytree structure (an initialized TrainState).  Auto-detects the
    backend from what is on disk."""
    wait_pending()  # never read an async write's target mid-flight
    orbax_path = os.path.join(os.path.abspath(path), "state_orbax")
    msgpack_path = os.path.join(path, "state.msgpack")
    if os.path.exists(orbax_path):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        # _to_host, not device_get: a multi-host replicated template spans
        # non-addressable devices, which device_get refuses (the save path
        # already handles this case).
        arr_template = jax.tree.map(_to_host, template)
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
    hist_path = os.path.join(path, "history.msgpack")
    if os.path.exists(hist_path):
        from flax import serialization

        with open(hist_path, "rb") as f:
            meta["arrays"] = serialization.msgpack_restore(f.read())
    return state, meta
