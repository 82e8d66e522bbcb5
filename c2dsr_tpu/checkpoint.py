"""Checkpoint save/restore (params + optimizer state + step + bookkeeping).

The reference creates a ``checkpoints/`` directory but never saves anything
(main.py:80-84; no ``torch.save`` in the tree — SURVEY.md section 5).  This
framework checkpoints for real: Orbax PyTree checkpoints of the full
TrainState plus experiment bookkeeping (best-validation improvement, epoch,
early-stop counter), save-on-best plus resume, with sharded-array support
for free.

Layout: ``<path>/state`` holds the TrainState pytree, ``<path>/meta.json``
the scalar bookkeeping (kept out of Orbax so it is greppable on disk).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save(path: str, state: Any, meta: Optional[Dict[str, Any]] = None) -> None:
    path = os.path.abspath(path)
    _checkpointer().save(os.path.join(path, "state"), jax.device_get(state),
                         force=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta or {}, f, indent=1)


def restore(path: str, template: Optional[Any] = None) -> Any:
    path = os.path.abspath(path)
    state_dir = os.path.join(path, "state")
    if template is not None:
        return _checkpointer().restore(state_dir,
                                       item=jax.device_get(template))
    return _checkpointer().restore(state_dir)


def load_meta(path: str) -> Dict[str, Any]:
    meta_file = os.path.join(os.path.abspath(path), "meta.json")
    if not os.path.isfile(meta_file):
        return {}
    with open(meta_file) as f:
        return json.load(f)


def exists(path: str) -> bool:
    return os.path.isdir(os.path.join(os.path.abspath(path), "state"))
