"""Tokenizers: char, BPE/WPE, SentencePiece-model loading, aggregate multilang.

Behavioral parity targets:
  * Char path — reference `CharParser` (`/root/reference/nemo/collections/common/
    parts/preprocessing/parsers.py:28-120`): strip + lowercase, per-word special
    labels, unk filtering.
  * BPE/WPE — reference wraps SentencePiece / HuggingFace WordPiece
    (`sentencepiece_tokenizer.py`). Here the native backend is the HuggingFace
    `tokenizers` library (BPE/WordPiece train + encode); additionally a
    dependency-free loader reads real `tokenizer.model` SentencePiece protobufs
    (hand-rolled wire-format parse, no sentencepiece install needed).
  * Aggregate — reference `AggregateTokenizer` (`aggregate_tokenizer.py:37`):
    ordered per-language sub-tokenizers with cumulative id offsets.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Dict, List, Optional, Protocol


class TokenizerSpec(Protocol):
    @property
    def vocab_size(self) -> int: ...
    def text_to_ids(self, text: str) -> List[int]: ...
    def ids_to_text(self, ids: List[int]) -> str: ...


# ---------------------------------------------------------------------------
# Char tokenizer (CharParser semantics)
# ---------------------------------------------------------------------------


class CharTokenizer:
    """Char-level tokenizer with the reference CharParser's normalization
    rules. `parser="en"` additionally applies the ENCharParser cleaning
    pipeline (parsers.py:128: ascii-fold, number/abbreviation expansion,
    punctuation wording — see data/cleaners.py). Unlike the reference, the
    default stays "base": AudioToCharDataset defaults parser to \'en\' even
    for non-English recipes (e.g. the fork\'s Vietnamese
    conformer_ctc_char.yaml), where ascii-folding would strip the diacritics
    its own label set defines — set parser: en explicitly for English data.
    """

    def __init__(
        self,
        labels: List[str],
        *,
        unk_id: int = -1,
        blank_id: int = -1,
        do_lowercase: bool = True,
        do_normalize: bool = True,
        parser: str = "base",
    ):
        self.labels = list(labels)
        self._labels_map = {label: i for i, label in enumerate(self.labels)}
        self._special_labels = {l for l in self.labels if len(l) > 1}
        self._unk_id = unk_id
        self._blank_id = blank_id
        self._do_lowercase = do_lowercase
        self._do_normalize = do_normalize
        if parser not in ("base", "en"):
            raise ValueError(f"unknown parser {parser!r} (base | en)")
        self._en_table = None
        if parser == "en":
            from conformer_nemo_tpu.data.cleaners import make_table

            self._en_table = make_table(self.labels)

    @property
    def vocab_size(self) -> int:
        return len(self.labels)

    def text_to_ids(self, text: str) -> Optional[List[int]]:
        if self._en_table is not None:
            from conformer_nemo_tpu.data.cleaners import clean_text

            text = clean_text(text, self._en_table)
        if self._do_normalize:
            text = text.strip()
            if self._do_lowercase:
                text = text.lower()
        tokens: List[int] = []
        for word_id, word in enumerate(text.split(" ")):
            if word_id != 0:
                tokens.append(self._labels_map.get(" ", self._unk_id))
            if word in self._special_labels:
                tokens.append(self._labels_map[word])
                continue
            for char in word:
                tokens.append(self._labels_map.get(char, self._unk_id))
        return [t for t in tokens if t != self._blank_id]

    def ids_to_text(self, ids: List[int]) -> str:
        return "".join(self.labels[i] for i in ids if 0 <= i < len(self.labels))

    def ids_to_tokens(self, ids: List[int]) -> List[str]:
        return [self.labels[i] for i in ids if 0 <= i < len(self.labels)]


# ---------------------------------------------------------------------------
# SentencePiece model loading without the sentencepiece package
# ---------------------------------------------------------------------------


def _parse_protobuf_fields(buf: bytes):
    """Minimal protobuf wire-format walker: yields (field_number, wire_type, value)."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            val, i = _read_varint(buf, i)
        elif wire == 1:  # 64-bit
            val, i = buf[i : i + 8], i + 8
        elif wire == 2:  # length-delimited
            ln, i = _read_varint(buf, i)
            val, i = buf[i : i + ln], i + ln
        elif wire == 5:  # 32-bit
            val, i = buf[i : i + 4], i + 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _read_varint(buf: bytes, i: int):
    shift, out = 0, 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def load_sentencepiece_vocab(model_path: str):
    """Parse a SentencePiece ModelProto: returns [(piece, score, type)].

    ModelProto field 1 = repeated SentencePiece{piece=1:str, score=2:float,
    type=3:enum} (types: 1=NORMAL, 2=UNK, 3=CONTROL, 4=USER_DEFINED, 6=BYTE).
    """
    return load_sentencepiece_model(model_path)[0]


def load_sentencepiece_model(model_path: str):
    """Full ModelProto parse -> (pieces, trainer_spec, normalizer_spec).

    Field numbers per sentencepiece_model.proto: ModelProto{pieces=1,
    trainer_spec=2, normalizer_spec=3}; TrainerSpec{model_type=3 (1=unigram,
    2=bpe, 3=word, 4=char), byte_fallback=35}; NormalizerSpec{name=1,
    add_dummy_prefix=3, remove_extra_whitespaces=4, escape_whitespaces=5}.
    """
    with open(model_path, "rb") as f:
        data = f.read()
    pieces = []
    trainer = {"model_type": 1, "byte_fallback": False}
    norm = {"name": "nmt_nfkc", "add_dummy_prefix": True,
            "remove_extra_whitespaces": True, "escape_whitespaces": True}
    for field, wire, val in _parse_protobuf_fields(data):
        if field == 1 and wire == 2:
            piece, score, ptype = None, 0.0, 1
            for f2, w2, v2 in _parse_protobuf_fields(val):
                if f2 == 1 and w2 == 2:
                    piece = v2.decode("utf-8")
                elif f2 == 2 and w2 == 5:
                    score = struct.unpack("<f", v2)[0]
                elif f2 == 3 and w2 == 0:
                    ptype = v2
            if piece is not None:
                pieces.append((piece, score, ptype))
        elif field == 2 and wire == 2:  # TrainerSpec
            for f2, w2, v2 in _parse_protobuf_fields(val):
                if f2 == 3 and w2 == 0:
                    trainer["model_type"] = v2
                elif f2 == 35 and w2 == 0:
                    trainer["byte_fallback"] = bool(v2)
        elif field == 3 and wire == 2:  # NormalizerSpec
            for f2, w2, v2 in _parse_protobuf_fields(val):
                if f2 == 1 and w2 == 2:
                    norm["name"] = v2.decode("utf-8")
                elif f2 == 3 and w2 == 0:
                    norm["add_dummy_prefix"] = bool(v2)
                elif f2 == 4 and w2 == 0:
                    norm["remove_extra_whitespaces"] = bool(v2)
                elif f2 == 5 and w2 == 0:
                    norm["escape_whitespaces"] = bool(v2)
    return pieces, trainer, norm


_SP_SPACE = "▁"  # SentencePiece meta-space

# see _normalize: nmt_* pre-NFKC rule families (delete controls, space the
# whitespace family), exact codepoint lists from sentencepiece
# builder.cc BuildNmtNFKCMap (NOT whole ranges: only 0x007F/0x008F/0x009F of
# the C1 block are deleted — e.g. U+0085 NEL is untouched there — and the
# space-mapped set includes U+200B-200F, U+2581 meta-space, U+FEFF BOM and
# U+FFFD; PARITY.md notes coverage stays approximate until a
# charsmap-bearing differential fixture exists)
_NMT_CHARMAP = {}
for _c in (list(range(0x0001, 0x0009)) + [0x000B] + list(range(0x000E, 0x0020))
           + [0x007F, 0x008F, 0x009F]):
    _NMT_CHARMAP[_c] = None  # deleted
for _c in ([0x0009, 0x000A, 0x000C, 0x000D, 0x1680]
           + list(range(0x200B, 0x2010))
           + [0x2028, 0x2029, 0x2581, 0xFEFF, 0xFFFD]):
    _NMT_CHARMAP[_c] = " "
del _c


class SentencePieceTokenizer:
    """Inference-only tokenizer over a SentencePiece model file.

    Parity target: the `sentencepiece` C++ library the reference wraps
    (`sentencepiece_tokenizer.py:1-378`), re-implemented from the model file:
      * BPE models (TrainerSpec.model_type=2): exact merge-order encoding —
        repeatedly merge the adjacent pair whose merged piece has the highest
        score, ties broken by left position (bpe_model.cc agenda semantics).
      * unigram models: Viterbi segmentation maximizing summed piece scores
        (unigram_model.cc).
    Normalization follows NormalizerSpec: optional NFKC, extra-whitespace
    removal, dummy prefix, meta-space escaping. Exact round-trip decode.
    """

    def __init__(self, model_path: str):
        raw, trainer, norm = load_sentencepiece_model(model_path)
        self.pieces = [p for p, _, _ in raw]
        self.scores = [s for _, s, _ in raw]
        self.types = [t for _, _, t in raw]
        self.model_type = int(trainer.get("model_type", 1))
        self.byte_fallback = bool(trainer.get("byte_fallback", False))
        self.norm = norm
        # CONTROL(3)/UNK(2) pieces never match text (bpe_model.cc skips them)
        self._piece_to_id = {
            p: i for i, (p, t) in enumerate(zip(self.pieces, self.types))
            if t not in (2, 3)
        }
        self.unk_id = next((i for i, t in enumerate(self.types) if t == 2), 0)
        self._max_piece_len = max((len(p) for p in self.pieces), default=1)

    @property
    def vocab_size(self) -> int:
        return len(self.pieces)

    @property
    def vocab(self) -> List[str]:
        return list(self.pieces)

    def _normalize(self, text: str) -> str:
        name = self.norm.get("name") or ""
        if "nmt" in name:
            # the nmt_* rulesets (sentencepiece builder.cc BuildNmtNFKCMap)
            # prepend two rule families to NFKC: control characters are
            # DELETED (0x0001-0x0008, 0x000B, 0x000E-0x001F, 0x007F-0x009F),
            # and the whitespace family is mapped to ASCII space (tab, LF,
            # FF, CR, U+1680, U+2000-U+200F incl. the zero-widths, U+2028,
            # U+2029, U+202F, U+205F, U+3000)
            text = text.translate(_NMT_CHARMAP)
        if "nfkc" in name:
            import unicodedata

            text = unicodedata.normalize("NFKC", text)
        if self.norm.get("remove_extra_whitespaces", True):
            # the real library collapses/strips only ' ' (other whitespace
            # reaches here only if the charsmap left it intact)
            out = []
            for ch in text:
                if ch == " " and out and out[-1] == " ":
                    continue
                out.append(ch)
            text = "".join(out).strip(" ")
        if not text:
            # real sentencepiece encodes empty/whitespace-only input to []
            return ""
        if self.norm.get("add_dummy_prefix", True):
            text = " " + text
        if self.norm.get("escape_whitespaces", True):
            text = text.replace(" ", _SP_SPACE)
        return text

    def _char_ids(self, ch: str) -> List[int]:
        """OOV character -> byte pieces (byte_fallback) or unk."""
        if self.byte_fallback:
            out = []
            for b in ch.encode("utf-8"):
                bid = self._piece_to_id.get("<0x%02X>" % b)
                out.append(bid if bid is not None else self.unk_id)
            return out
        return [self.unk_id]

    def text_to_ids(self, text: str) -> List[int]:
        s = self._normalize(text)
        if not s:
            return []
        if self.model_type == 2:
            return self._encode_bpe(s)
        return self._encode_viterbi(s)

    def _encode_bpe(self, s: str) -> List[int]:
        """sentencepiece bpe_model.cc: agenda of adjacent symbol pairs ordered
        by (merged-piece score desc, left position asc); merge until no pair's
        concatenation is in the vocabulary."""
        import heapq

        n = len(s)
        sym = list(s)  # symbol strings, indexed by original left position
        nxt = list(range(1, n)) + [-1]
        prv = [-1] + list(range(n - 1))
        alive = [True] * n
        heap: list = []

        def push(l: int):
            r = nxt[l]
            if l < 0 or r < 0:
                return
            pid = self._piece_to_id.get(sym[l] + sym[r])
            if pid is not None:
                heapq.heappush(heap, (-self.scores[pid], l, sym[l] + sym[r], pid))

        for i in range(n - 1):
            push(i)
        while heap:
            _, l, merged, pid = heapq.heappop(heap)
            r = nxt[l]
            if not alive[l] or r < 0 or not alive[r] or sym[l] + sym[r] != merged:
                continue  # stale agenda entry
            sym[l] = merged
            alive[r] = False
            nxt[l] = nxt[r]
            if nxt[r] >= 0:
                prv[nxt[r]] = l
            push(prv[l])
            push(l)

        ids: List[int] = []
        i = 0  # position 0 stays alive: merges always keep the left node
        while i >= 0:
            pid = self._piece_to_id.get(sym[i])
            if pid is not None:
                ids.append(pid)
            else:
                ids.extend(self._char_ids(sym[i]))
            i = nxt[i]
        return ids

    def _encode_viterbi(self, s: str) -> List[int]:
        n = len(s)
        NEG = -1e18
        best = [NEG] * (n + 1)
        back: List[Optional[tuple]] = [None] * (n + 1)
        best[0] = 0.0
        for i in range(n):
            if best[i] <= NEG / 2:
                continue
            hi = min(n, i + self._max_piece_len)
            for j in range(i + 1, hi + 1):
                pid = self._piece_to_id.get(s[i:j])
                if pid is None:
                    if j == i + 1:  # single char fallback -> unk/bytes
                        sc = best[i] - 100.0
                        if sc > best[j]:
                            best[j], back[j] = sc, (i, None)
                    continue
                sc = best[i] + self.scores[pid]
                if sc > best[j]:
                    best[j], back[j] = sc, (i, pid)
        ids: List[int] = []
        j = n
        while j > 0:
            i, pid = back[j]
            ids.extend(reversed(self._char_ids(s[i:j]) if pid is None else [pid]))
            j = i
        return ids[::-1]

    @staticmethod
    def _byte_piece_value(piece: str):
        """'<0xNN>' byte-fallback piece -> int value, else None."""
        if (len(piece) == 6 and piece.startswith("<0x") and piece.endswith(">")):
            try:
                return int(piece[3:5], 16)
            except ValueError:
                return None
        return None

    def ids_to_text(self, ids: List[int]) -> str:
        # byte-fallback pieces must be reassembled into UTF-8 bytes (real
        # sentencepiece DecodePieces semantics), not emitted as '<0xNN>' text
        out: List[str] = []
        byte_buf = bytearray()
        for i in ids:
            if not (0 <= i < len(self.pieces)):
                continue
            p = self.pieces[i]
            # classify by piece TYPE (6 = BYTE), matching real sentencepiece
            # DecodePieces: a USER_DEFINED/NORMAL piece literally spelled
            # '<0xNN>' must NOT be consumed as a raw byte
            b = self._byte_piece_value(p) if self.types[i] == 6 else None
            if b is not None:
                byte_buf.append(b)
                continue
            if byte_buf:
                out.append(byte_buf.decode("utf-8", errors="replace"))
                byte_buf.clear()
            out.append(p)
        if byte_buf:
            out.append(byte_buf.decode("utf-8", errors="replace"))
        return "".join(out).replace(_SP_SPACE, " ").strip()

    def ids_to_tokens(self, ids: List[int]) -> List[str]:
        return [self.pieces[i] for i in ids if 0 <= i < len(self.pieces)]


class HFTokenizer:
    """BPE/WordPiece via the HuggingFace `tokenizers` library (native Rust core).

    Used both for loading trained `tokenizer.json` files and as the training
    backend (see `train_bpe_tokenizer`). This is the 'wpe'/'bpe' analogue of the
    reference's tokenizer dir contract (configs/conformer_ctc_bpe.yaml:76-78).
    """

    def __init__(self, tokenizer_file: str):
        from tokenizers import Tokenizer

        self._tok = Tokenizer.from_file(tokenizer_file)

    @property
    def vocab_size(self) -> int:
        return self._tok.get_vocab_size()

    @property
    def vocab(self) -> List[str]:
        v = self._tok.get_vocab()
        out = [""] * len(v)
        for tok, i in v.items():
            out[i] = tok
        return out

    def text_to_ids(self, text: str) -> List[int]:
        return self._tok.encode(text).ids

    def ids_to_text(self, ids: List[int]) -> str:
        return self._tok.decode(ids)

    def ids_to_tokens(self, ids: List[int]) -> List[str]:
        v = self.vocab
        return [v[i] for i in ids if 0 <= i < len(v)]


def train_bpe_tokenizer(
    texts, vocab_size: int, out_path: str, lowercase: bool = True
) -> "HFTokenizer":
    """Train a byte-level BPE tokenizer on an iterable of transcripts."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers, decoders, normalizers

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    norms = [normalizers.NFKC()]
    if lowercase:
        norms.append(normalizers.Lowercase())
    tok.normalizer = normalizers.Sequence(norms)
    tok.pre_tokenizer = pre_tokenizers.Metaspace()
    tok.decoder = decoders.Metaspace()
    trainer = trainers.BpeTrainer(vocab_size=vocab_size, special_tokens=["<unk>"])
    tok.train_from_iterator(texts, trainer)
    tok.save(out_path)
    return HFTokenizer(out_path)


# ---------------------------------------------------------------------------
# Aggregate (multilang) tokenizer
# ---------------------------------------------------------------------------


class AggregateTokenizer:
    """Ordered dict of per-language tokenizers with cumulative id offsets.

    Parity: reference AggregateTokenizer (aggregate_tokenizer.py:37) — token id
    spaces of the languages are concatenated in config order; ids_to_text
    routes each id back to its owning language tokenizer.
    """

    def __init__(self, tokenizers_by_lang: Dict[str, TokenizerSpec]):
        self.langs = list(tokenizers_by_lang.keys())
        self.tokenizers = tokenizers_by_lang
        self.offsets: Dict[str, int] = {}
        off = 0
        for lang in self.langs:
            self.offsets[lang] = off
            off += tokenizers_by_lang[lang].vocab_size
        self._total = off

    @property
    def vocab_size(self) -> int:
        return self._total

    def text_to_ids(self, text: str, lang: str) -> List[int]:
        off = self.offsets[lang]
        return [i + off for i in self.tokenizers[lang].text_to_ids(text)]

    def _owner(self, idx: int):
        for lang in reversed(self.langs):
            if idx >= self.offsets[lang]:
                return lang, idx - self.offsets[lang]
        raise ValueError(f"id {idx} out of range")

    def ids_to_text(self, ids: List[int]) -> str:
        # Group consecutive ids by owning language, decode per group.
        out, group, cur_lang = [], [], None
        for idx in ids:
            lang, local = self._owner(idx)
            if lang != cur_lang and group:
                out.append(self.tokenizers[cur_lang].ids_to_text(group))
                group = []
            cur_lang = lang
            group.append(local)
        if group:
            out.append(self.tokenizers[cur_lang].ids_to_text(group))
        return " ".join(t for t in out if t)


class WordTokenizer:
    """Word-level tokenizer over a newline-separated vocab file (reference
    `common/tokenizers/word_tokenizer.py:30`): text splits on whitespace,
    out-of-vocabulary words map to the unk token."""

    def __init__(self, vocab: List[str], unk_token: str = "<unk>"):
        self.labels = list(vocab)
        if unk_token not in self.labels:
            self.labels.append(unk_token)
        self._map = {w: i for i, w in enumerate(self.labels)}
        self._unk_id = self._map[unk_token]

    @property
    def vocab_size(self) -> int:
        return len(self.labels)

    def text_to_ids(self, text: str) -> List[int]:
        return [self._map.get(w, self._unk_id) for w in text.strip().split()]

    def ids_to_tokens(self, ids: List[int]) -> List[str]:
        return [self.labels[i] for i in ids if 0 <= i < len(self.labels)]

    def ids_to_text(self, ids: List[int]) -> str:
        return " ".join(self.ids_to_tokens(ids))


def build_tokenizer(cfg: dict):
    """Tokenizer factory from a reference-shaped config dict.

    {'type': 'bpe'|'wpe', 'dir': ...} or {'type': 'agg', 'langs': {id: {dir,type}}}
    or {'labels': [...]} for char (mirrors ASRBPEMixin._setup_tokenizer,
    mixins.py:49, and the char-model `labels` list).
    """
    if "labels" in cfg:
        return CharTokenizer(cfg["labels"])
    ttype = cfg.get("type", "bpe")
    if ttype == "agg":
        subs = {
            lang: build_tokenizer(sub_cfg) for lang, sub_cfg in cfg["langs"].items()
        }
        return AggregateTokenizer(subs)
    if ttype == "word":
        vf = cfg.get("vocab_file") or os.path.join(cfg["dir"], "vocab.txt")
        with open(vf, encoding="utf-8") as f:
            vocab = [line.rstrip("\n") for line in f if line.rstrip("\n")]
        return WordTokenizer(vocab)
    if cfg.get("model_file"):
        # direct SentencePiece model reference (converted-archive layout:
        # per-language files carry unique basenames, no per-lang dirs)
        return SentencePieceTokenizer(cfg["model_file"])
    d = cfg["dir"]
    hf_json = os.path.join(d, "tokenizer.json")
    sp_model = os.path.join(d, "tokenizer.model")
    if os.path.exists(hf_json):
        return HFTokenizer(hf_json)
    if os.path.exists(sp_model):
        return SentencePieceTokenizer(sp_model)
    vocab_txt = os.path.join(d, "vocab.txt")
    if os.path.exists(vocab_txt):
        with open(vocab_txt, encoding="utf-8") as f:
            labels = [line.rstrip("\n") for line in f if line.rstrip("\n")]
        return CharTokenizer(labels, do_lowercase=False)
    raise FileNotFoundError(f"no tokenizer artifacts found in {d}")
