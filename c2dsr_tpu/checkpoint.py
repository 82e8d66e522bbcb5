"""Checkpoint save/restore (params + optimizer state + step + bookkeeping).

The reference creates a ``checkpoints/`` directory but never saves anything
(main.py:80-84; no ``torch.save`` in the tree — SURVEY.md section 5).  This
framework checkpoints for real: Orbax checkpoints of the full TrainState
plus experiment bookkeeping (best-validation improvement, epoch, early-stop
counter), save-on-best plus resume, with sharded-array support for free.

Saves are ASYNC (round-5 verdict #7): ``save`` returns after serializing
device arrays to host and commits to disk on a background thread, so
save-on-best overlaps the next training epoch instead of blocking it.

Durability model (crash-safe at every instant):
  * saves alternate between ``<path>/state0`` and ``<path>/state1``;
    dispatching save k deletes only the checkpoint from two saves ago —
    the most recent COMPLETE checkpoint is never touched while the new
    commit is in flight;
  * ``meta.json`` (scalar bookkeeping, kept out of Orbax so it is
    greppable) carries ``state_dir`` and is (re)written only AFTER the
    state commit completes — it always points at a fully-written
    checkpoint;
  * an ``atexit`` hook joins the in-flight commit and writes its meta, so
    an exception that unwinds past the training loop still lands a
    consistent (checkpoint, meta) pair at interpreter exit.  Only a hard
    kill (SIGKILL/OOM) during the commit window loses the IN-FLIGHT save —
    never the previous one.

Restore accepts a template whose arrays carry shardings (concrete arrays
or ShapeDtypeStructs): each array restores straight to its mesh placement
(multi-chip resume).  Round-4 checkpoints (single ``state`` dir written by
the legacy PyTreeCheckpointer, no ``state_dir`` in meta) are detected by
layout and restored through the legacy reader — errors in the modern path
propagate instead of being masked by a fallback.
"""

from __future__ import annotations

import atexit
import json
import os
import threading
from typing import Any, Dict, Optional

_LOCK = threading.Lock()
_CHECKPOINTER = None         # singleton AsyncCheckpointer (owns its thread)
_PENDING_META: Optional[tuple] = None


def _checkpointer():
    global _CHECKPOINTER
    import orbax.checkpoint as ocp
    with _LOCK:
        if _CHECKPOINTER is None:
            _CHECKPOINTER = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler())
    return _CHECKPOINTER


def _write_meta(path: str, meta: Dict[str, Any]) -> None:
    os.makedirs(path, exist_ok=True)   # atexit may fire after dir cleanup
    tmp = os.path.join(path, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(path, "meta.json"))
    if meta.get("state_dir"):
        # a modern checkpoint is now current: a leftover round-4 'state'
        # dir is strictly older — drop it so it cannot become a silent
        # stale fallback if meta.json is ever lost
        import shutil
        shutil.rmtree(os.path.join(path, "state"), ignore_errors=True)


def wait() -> None:
    """Join the in-flight async commit (if any) and write its meta."""
    global _PENDING_META
    if _CHECKPOINTER is not None:
        _CHECKPOINTER.wait_until_finished()
    with _LOCK:
        pending, _PENDING_META = _PENDING_META, None
    if pending is not None:
        _write_meta(*pending)


atexit.register(wait)


def _state_dir(path: str) -> Optional[str]:
    """Directory of the newest COMPLETE checkpoint, or None."""
    meta = load_meta(path, _wait=False)
    name = meta.get("state_dir")
    if name and os.path.isdir(os.path.join(path, name)):
        return os.path.join(path, name)
    legacy = os.path.join(path, "state")        # round-4 layout
    return legacy if os.path.isdir(legacy) else None


def save(path: str, state: Any, meta: Optional[Dict[str, Any]] = None,
         block: bool = False) -> None:
    """Checkpoint ``state`` under ``path``.

    block=False (default): returns once device arrays are snapshotted to
    host; the disk commit runs on Orbax's background thread and meta.json
    is written when it completes (on the next ``save``/``wait``/exit).
    block=True forces a synchronous commit (tests, final save).
    """
    global _PENDING_META
    path = os.path.abspath(path)
    wait()                       # at most one commit in flight
    os.makedirs(path, exist_ok=True)
    prev = load_meta(path, _wait=False).get("state_dir")
    nxt = "state1" if prev == "state0" else "state0"
    ckpt = _checkpointer()
    # force=True deletes only <nxt> — the checkpoint from TWO saves ago;
    # the one meta.json points at (<prev>) stays intact until the new
    # commit has landed and meta is rewritten
    ckpt.save(os.path.join(path, nxt), state, force=True)
    with _LOCK:
        _PENDING_META = (path, dict(meta or {}, state_dir=nxt))
    if block:
        wait()


def restore(path: str, template: Optional[Any] = None) -> Any:
    """Restore the TrainState.  ``template`` (a concrete or abstract
    TrainState pytree) drives dtypes/shapes AND shardings: arrays carrying
    ``.sharding`` (concrete jax arrays, or ``jax.ShapeDtypeStruct`` with
    sharding set) restore directly to their mesh placement."""
    import jax
    import orbax.checkpoint as ocp
    wait()                       # never read concurrently with a commit
    path = os.path.abspath(path)
    state_dir = _state_dir(path)
    if state_dir is None:
        raise FileNotFoundError(f"no checkpoint under {path}")
    legacy = os.path.basename(state_dir) == "state"
    if template is not None:
        if legacy:
            # round-4 PyTreeCheckpointer layout
            return ocp.PyTreeCheckpointer().restore(
                state_dir, item=jax.device_get(template))
        return _checkpointer().restore(
            state_dir, args=ocp.args.StandardRestore(template))
    if legacy:
        return ocp.PyTreeCheckpointer().restore(state_dir)
    return _checkpointer().restore(state_dir)


def load_meta(path: str, _wait: bool = True) -> Dict[str, Any]:
    if _wait:
        wait()
    meta_file = os.path.join(os.path.abspath(path), "meta.json")
    if not os.path.isfile(meta_file):
        return {}
    with open(meta_file) as f:
        return json.load(f)


def exists(path: str) -> bool:
    wait()
    return _state_dir(os.path.abspath(path)) is not None
