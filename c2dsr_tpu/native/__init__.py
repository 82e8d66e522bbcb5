"""ctypes bindings for the native C++ data layer (preprocess.cpp).

``load()`` compiles the shared library on first use (g++ -O2, cached next
to the source) and returns a small wrapper; returns None when no compiler
is available, in which case callers fall back to the pure-Python
implementations in c2dsr_tpu.data (same semantics, golden-tested against
each other in tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "preprocess.cpp")
_LIB = os.path.join(_DIR, "libc2dsr_native.so")

_cached = None
_tried = False

N_TRAIN_FIELDS = 14
EVAL_SEQ_FIELDS = 6


def _compile() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _LIB],
            check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


class Native:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        c = ctypes
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.cds_parse.restype = c.c_void_p
        lib.cds_parse.argtypes = [c.c_char_p]
        lib.cds_n_users.restype = c.c_int64
        lib.cds_n_users.argtypes = [c.c_void_p]
        lib.cds_n_interactions.restype = c.c_int64
        lib.cds_n_interactions.argtypes = [c.c_void_p]
        lib.cds_fill.argtypes = [c.c_void_p, i64p, i32p]
        lib.cds_free.argtypes = [c.c_void_p]
        lib.cds_build_edges.restype = c.c_int64
        lib.cds_build_edges.argtypes = [i64p, i32p, c.c_int64, c.c_int32,
                                        i32p, i32p,
                                        c.POINTER(c.c_int64)]
        lib.cds_preprocess_train.restype = c.c_int64
        lib.cds_preprocess_train.argtypes = [
            i64p, i32p, c.c_int64, c.c_int32, c.c_int32, c.c_int32,
            c.c_uint64, i32p]
        lib.cds_preprocess_eval.restype = c.c_int64
        lib.cds_preprocess_eval.argtypes = [
            i64p, i32p, c.c_int64, c.c_int32, c.c_int32, c.c_int32,
            c.c_int32, c.c_int32, c.c_uint64, i32p, i32p, i32p]

    # -- parsing ------------------------------------------------------------
    def parse_interactions(self, path: str
                           ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (offsets int64 [n_users+1], items int32 [total])"""
        h = self._lib.cds_parse(path.encode())
        if not h:
            raise FileNotFoundError(path)
        try:
            n_users = self._lib.cds_n_users(h)
            n_inter = self._lib.cds_n_interactions(h)
            offsets = np.empty(n_users + 1, np.int64)
            items = np.empty(max(n_inter, 1), np.int32)
            self._lib.cds_fill(h, offsets, items)
            return offsets, items[:n_inter]
        finally:
            self._lib.cds_free(h)

    # -- graph --------------------------------------------------------------
    def build_edges(self, offsets: np.ndarray, items: np.ndarray,
                    n_item_a: int) -> Tuple[np.ndarray, np.ndarray]:
        n_users = len(offsets) - 1
        cap = max(len(items), 1)
        share = np.empty((cap, 2), np.int32)
        spec = np.empty((cap, 2), np.int32)
        n_spec = ctypes.c_int64(0)
        n_share = self._lib.cds_build_edges(
            np.ascontiguousarray(offsets), np.ascontiguousarray(items),
            n_users, n_item_a, share.reshape(-1), spec.reshape(-1),
            ctypes.byref(n_spec))
        return share[:n_share].copy(), spec[:n_spec.value].copy()

    # -- examples -----------------------------------------------------------
    def preprocess_train(self, offsets, items, n_item_a, n_item_b, len_max,
                         seed: int):
        n_users = len(offsets) - 1
        out = np.empty((max(n_users, 1), N_TRAIN_FIELDS, len_max), np.int32)
        kept = self._lib.cds_preprocess_train(
            np.ascontiguousarray(offsets), np.ascontiguousarray(items),
            n_users, n_item_a, n_item_b, len_max, seed, out.reshape(-1))
        return out[:kept].copy()

    def preprocess_eval(self, offsets, items, n_item_a, n_item_b, len_max,
                        n_neg, seed: int, bug_truncated_b=False):
        n_users = len(offsets) - 1
        n = max(n_users, 1)
        seqs = np.empty((n, EVAL_SEQ_FIELDS, len_max), np.int32)
        scalars = np.empty((n, 4), np.int32)
        negs = np.empty((n, n_neg), np.int32)
        kept = self._lib.cds_preprocess_eval(
            np.ascontiguousarray(offsets), np.ascontiguousarray(items),
            n_users, n_item_a, n_item_b, len_max, n_neg,
            int(bug_truncated_b), seed, seqs.reshape(-1),
            scalars.reshape(-1), negs.reshape(-1))
        return seqs[:kept].copy(), scalars[:kept].copy(), negs[:kept].copy()


def load(force_rebuild: bool = False) -> Optional[Native]:
    """Compile-on-first-use loader; None if unavailable."""
    global _cached, _tried
    if _cached is not None and not force_rebuild:
        return _cached
    if _tried and not force_rebuild:
        return _cached
    _tried = True
    needs_build = force_rebuild or not os.path.exists(_LIB) or (
        os.path.getmtime(_LIB) < os.path.getmtime(_SRC))
    if needs_build and not _compile():
        return None
    try:
        _cached = Native(ctypes.CDLL(_LIB))
    except OSError:
        _cached = None
    return _cached
