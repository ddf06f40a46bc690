"""CTC beam search with n-gram LM fusion — Python wrapper over the native
C++ decoder (native/ctc_beam/ctc_beam.cpp).

Parity target: reference `BeamSearchDecoderWithLM`
(`/root/reference/nemo/collections/asr/modules/beam_search_decoder.py:21-103`):
device produces log-probs, host C++ runs prefix beam search with
Scorer(alpha, beta, lm_path, vocab); batch parallel over CPU cores.

Build: compiled on demand with g++ -O3 (no pybind11 — plain C ABI via ctypes);
cached under native/build/.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "ctc_beam", "ctc_beam.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libctc_beam.so")

_lock = threading.Lock()
_lib = None


def _compile() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    src_mtime = max(
        os.path.getmtime(_SRC),
        os.path.getmtime(os.path.join(os.path.dirname(_SRC), "kenlm_probing.h")),
        os.path.getmtime(os.path.join(os.path.dirname(_SRC), "kenlm_trie.h")),
    )
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= src_mtime:
        return _SO
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def _load():
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_compile())
            lib.ctc_lm_load.restype = ctypes.c_void_p
            lib.ctc_lm_load.argtypes = [ctypes.c_char_p]
            lib.ctc_lm_free.argtypes = [ctypes.c_void_p]
            lib.ctc_lm_save_binary.restype = ctypes.c_int
            lib.ctc_lm_save_binary.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.ctc_lm_load_kenlm_bin.restype = ctypes.c_void_p
            lib.ctc_lm_load_kenlm_bin.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
            lib.ctc_lm_kenlm_word.restype = ctypes.c_int
            lib.ctc_lm_kenlm_word.argtypes = [
                ctypes.c_void_p, ctypes.c_uint32, ctypes.c_char_p, ctypes.c_int]
            lib.ctc_lm_score_word.restype = ctypes.c_double
            lib.ctc_lm_score_word.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p]
            lib.ctc_beam_search.restype = ctypes.c_int
            lib.ctc_beam_search.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_double, ctypes.c_double, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
            ]
            _lib = lib
    return _lib


class BeamSearchDecoderWithLM:
    """Char-level CTC prefix beam search with optional ARPA n-gram LM.

    vocab: list of labels (id order); blank is assumed to be the LAST index
    (reference convention: blank = V, conv_asr.py:436).
    """

    def __init__(
        self,
        vocab: Sequence[str],
        beam_width: int = 64,
        alpha: float = 1.0,
        beta: float = 1.5,
        lm_path: Optional[str] = None,
        num_cpus: int = 4,
        lm_binary_cache: bool = True,
        kenlm_probing: bool = False,
        kenlm_bin: bool = False,
    ):
        """lm_binary_cache: transparently cache the parsed ARPA tables next
        to the file (`<lm_path>.binlm`, our flat format — NOT KenLM .bin) and
        reload from the cache when fresh; large LMs then load in one read
        instead of a full text parse at serving startup.

        kenlm_bin: opt-in direct reader for KenLM `.bin` files of the
        PROBING (build_binary default) and full TRIE family — trie,
        quant_trie, array_trie, quant_array_trie (`build_binary -a`) — data
        structures (native/ctc_beam/kenlm_probing.h / kenlm_trie.h). Off by
        default: the readers' structural validation is thorough but full
        per-word score parity against the real library is only provable
        where the kenlm wheel exists (tests/test_kenlm_differential.py runs
        it there). rest_probing binaries are always rejected with
        conversion guidance. `kenlm_probing` is the original (pre-trie)
        spelling of the same opt-in."""
        self.vocab = list(vocab)
        self.blank_id = len(self.vocab)
        self.beam_width = beam_width
        self.alpha = alpha
        self.beta = beta
        self.num_cpus = max(1, num_cpus)
        self._lib = _load()
        self._lm = None
        kenlm_bin = kenlm_bin or kenlm_probing
        if lm_path:
            from conformer_nemo_tpu.decode.kenlm_binary import (
                is_kenlm_binary, parse_header)

            if is_kenlm_binary(lm_path):
                hdr = parse_header(lm_path)
                readable = hdr is not None and hdr.model_type in (
                    "probing", "trie", "quant_trie", "array_trie",
                    "quant_array_trie")
                if readable and kenlm_bin:
                    err = ctypes.create_string_buffer(512)
                    handle = self._lib.ctc_lm_load_kenlm_bin(
                        lm_path.encode(), err, len(err))
                    if not handle:
                        raise ValueError(
                            f"{lm_path}: {err.value.decode(errors='replace')}")
                    self._lm = ctypes.c_void_p(handle)
                    self._vocab_joined = "\n".join(
                        self.vocab + ["<blank>"]).encode()
                    return
                hint = (
                    f"This IS a {hdr.model_type}-structure binary: pass "
                    "kenlm_bin=True (alias kenlm_probing=True) to read it "
                    "directly (per-word score parity vs the real library is "
                    "enforced by tests/test_kenlm_differential.py wherever "
                    "the kenlm wheel exists). Alternatively, "
                    if readable else
                    "The direct reader (kenlm_bin=True) covers probing and "
                    "the full trie family but not this one. ")
                raise ValueError(
                    f"{lm_path} is a {hdr.describe() if hdr else 'KenLM binary'}. "
                    "This framework's scorer consumes ARPA text (plus its own "
                    ".binlm cache, built automatically on first ARPA load). "
                    f"{hint}"
                    "KenLM binaries are compiled FROM an ARPA with kenlm's "
                    "build_binary and kenlm ships no reverse converter: pass "
                    "the source .arpa here instead, or rebuild one with "
                    f"`lmplz -o {(hdr.order if hdr and hdr.order else 'N')} "
                    "<corpus.txt >lm.arpa`.")
            load_path, write_cache = lm_path, False
            if lm_binary_cache and not lm_path.endswith(".binlm"):
                cache = lm_path + ".binlm"
                if (os.path.exists(cache)
                        and os.path.getmtime(cache) >= os.path.getmtime(lm_path)):
                    load_path = cache
                else:
                    write_cache = True
            handle = self._lib.ctc_lm_load(load_path.encode())
            if not handle and load_path != lm_path:
                # stale/corrupt cache: drop it and fall back to the ARPA text
                try:
                    os.remove(load_path)
                except OSError:
                    pass
                load_path, write_cache = lm_path, True
                handle = self._lib.ctc_lm_load(load_path.encode())
            if not handle:
                raise ValueError(f"failed to load ARPA LM from {load_path}")
            self._lm = ctypes.c_void_p(handle)
            if write_cache:
                # best-effort: an unwritable directory just skips the cache
                self._lib.ctc_lm_save_binary(self._lm, (lm_path + ".binlm").encode())
        # vocab passed to native: labels + blank sentinel row
        self._vocab_joined = "\n".join(self.vocab + ["<blank>"]).encode()

    def __del__(self):
        if getattr(self, "_lm", None) and getattr(self, "_lib", None):
            self._lib.ctc_lm_free(self._lm)

    def lm_score(self, context: Sequence[str], word: str) -> float:
        """log10 P(word | context) from the loaded ARPA LM (Katz backoff).
        Differential-test surface against real KenLM; raises without an LM."""
        if self._lm is None:
            raise ValueError("no LM loaded")
        return float(self._lib.ctc_lm_score_word(
            self._lm, " ".join(context).encode(), word.encode()))

    def _decode_one(self, log_probs: np.ndarray, nbest: int) -> List[Tuple[str, float]]:
        lp = np.ascontiguousarray(log_probs, dtype=np.float32)
        t, v = lp.shape
        assert v == len(self.vocab) + 1, (v, len(self.vocab))
        buf = ctypes.create_string_buffer(1 << 20)
        n = self._lib.ctc_beam_search(
            lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), t, v,
            self._vocab_joined, self.blank_id, self.beam_width,
            self.alpha if self._lm else 0.0, self.beta if self._lm else 0.0,
            self._lm, nbest, buf, len(buf),
        )
        if n < 0:
            raise RuntimeError("ctc_beam_search output buffer overflow")
        out = []
        if n > 0:
            for part in buf.value.decode("utf-8", "replace").split("\x02"):
                text, _, score = part.partition("\x01")
                out.append((text, float(score)))
        return out

    def __call__(
        self,
        log_probs_batch: np.ndarray,  # [B, T, V+1]
        seq_lens: Optional[np.ndarray] = None,
        nbest: int = 1,
    ) -> List[List[Tuple[str, float]]]:
        """Batch decode, parallel over CPU threads (the native code releases
        the GIL during ctypes calls)."""
        log_probs_batch = np.asarray(log_probs_batch)
        b = log_probs_batch.shape[0]
        items = []
        for i in range(b):
            lp = log_probs_batch[i]
            if seq_lens is not None:
                lp = lp[: int(seq_lens[i])]
            items.append(lp)
        if b == 1 or self.num_cpus == 1:
            return [self._decode_one(lp, nbest) for lp in items]
        with ThreadPoolExecutor(max_workers=self.num_cpus) as ex:
            return list(ex.map(lambda lp: self._decode_one(lp, nbest), items))
