"""Checkpoint save/restore (params + optimizer state + step).

The reference creates a ``checkpoints/`` directory but never saves anything
(main.py:80-84; no ``torch.save`` in the tree — SURVEY.md section 5).  This
framework checkpoints for real: Orbax PyTree checkpoints of the full
TrainState, save-on-best plus resume, with sharded-array support for free.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _manager(path: str):
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer(), ocp


def save(path: str, state: Any) -> None:
    ckptr, _ = _manager(path)
    path = os.path.abspath(path)
    ckptr.save(path, jax.device_get(state), force=True)


def restore(path: str, template: Optional[Any] = None) -> Any:
    ckptr, _ = _manager(path)
    path = os.path.abspath(path)
    if template is not None:
        return ckptr.restore(path, item=jax.device_get(template))
    return ckptr.restore(path)


def exists(path: str) -> bool:
    return os.path.isdir(path)
