"""Shared BENCH_DETAILS.json read-merge-write helper.

Every bench harness records its section through this single function so
merge behavior (path, atomic replace, formatting) cannot drift between
harnesses."""

from __future__ import annotations

import json
import os

DETAILS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_DETAILS.json")


def merge(update: dict) -> str:
    details = {}
    if os.path.exists(DETAILS):
        with open(DETAILS) as f:
            details = json.load(f)
    details.update(update)
    tmp = DETAILS + ".tmp"
    with open(tmp, "w") as f:
        json.dump(details, f, indent=1)
    os.replace(tmp, DETAILS)
    return DETAILS
