"""Word/character error rate, host-side.

Parity target: reference `word_error_rate` (metrics/wer.py:27-60), which uses
the C++ `editdistance` package. The distance core here is likewise native:
`native/editdistance/edit_distance.cpp` (two-row int DP, C ABI via ctypes,
compiled on demand like the CTC beam decoder), with a pure-Python fallback
when no compiler is available. Tokens are interned to int32 ids before
crossing the ABI.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "editdistance", "edit_distance.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libedit_distance.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            os.makedirs(_BUILD_DIR, exist_ok=True)
            if not (os.path.exists(_SO)
                    and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
                     "-o", _SO],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.edit_distance_i32.restype = ctypes.c_int64
            lib.edit_distance_i32.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ]
            _lib = lib
        except Exception:  # no compiler / sandbox: fall back to Python
            _lib_failed = True
    return _lib


def _edit_distance_py(a: Sequence, b: Sequence) -> int:
    if len(a) < len(b):
        a, b = b, a
    if len(b) == 0:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def edit_distance(a: Sequence, b: Sequence) -> int:
    """Levenshtein distance between two token sequences."""
    lib = _load()
    if lib is None:
        return _edit_distance_py(a, b)
    interned = {}
    def ids(seq):
        out = np.empty(len(seq), np.int32)
        for i, tok in enumerate(seq):
            out[i] = interned.setdefault(tok, len(interned))
        return out
    ia, ib = ids(a), ids(b)
    pa = ia.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    pb = ib.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    return int(lib.edit_distance_i32(pa, len(ia), pb, len(ib)))


def word_error_rate(hypotheses: List[str], references: List[str], use_cer: bool = False) -> float:
    """Corpus-level WER = total edits / total reference words (wer.py:27)."""
    if len(hypotheses) != len(references):
        raise ValueError(
            f"hypotheses ({len(hypotheses)}) and references ({len(references)}) "
            "must have the same number of elements"
        )
    scores, words = wer_num_denom(hypotheses, references, use_cer)
    return 1.0 * scores / words if words else float("inf")


def wer_num_denom(hypotheses: List[str], references: List[str], use_cer: bool = False):
    """(edits, words) pair for distributed sum-reduction (wer.py:124-125 states)."""
    scores, words = 0, 0
    for h, r in zip(hypotheses, references):
        h_list = list(h) if use_cer else h.split()
        r_list = list(r) if use_cer else r.split()
        words += len(r_list)
        scores += edit_distance(h_list, r_list)
    return scores, words
