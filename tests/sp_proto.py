"""SentencePiece ModelProto builder (shared test fixture machinery).

Writes valid `tokenizer.model` protobufs from the published
sentencepiece_model.proto field numbers: ModelProto{pieces=1, trainer_spec=2,
normalizer_spec=3}; SentencePiece{piece=1, score=2, type=3};
TrainerSpec{model_type=3, byte_fallback=35}; NormalizerSpec{name=1,
precompiled_charsmap=2, add_dummy_prefix=3, remove_extra_whitespaces=4,
escape_whitespaces=5}.

Used by the algorithm tests (test_sentencepiece_bpe.py), and by
tests/fixtures/gen_sp_fixtures.py to produce the COMMITTED differential
fixtures that `test_sentencepiece_differential.py` feeds to the REAL
sentencepiece library wherever that wheel exists.
"""

import struct

SP = "▁"  # meta space


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wire) + payload


def _string(num: int, s) -> bytes:
    b = s.encode("utf-8") if isinstance(s, str) else s
    return _field(num, 2, _varint(len(b)) + b)


def _float(num: int, v: float) -> bytes:
    return _field(num, 5, struct.pack("<f", v))


def _varint_field(num: int, v: int) -> bytes:
    return _field(num, 0, _varint(v))


def make_model(pieces, model_type=2, byte_fallback=False,
               add_dummy_prefix=True, norm_name="nmt_nfkc",
               remove_extra_whitespaces=None, escape_whitespaces=None):
    """pieces: list of (piece, score, type). Returns serialized ModelProto."""
    blob = b""
    for piece, score, ptype in pieces:
        sub = _string(1, piece) + _float(2, score) + _varint_field(3, ptype)
        blob += _string(1, sub)
    trainer = _varint_field(3, model_type)
    if byte_fallback:
        trainer += _varint_field(35, 1)
    blob += _string(2, trainer)
    norm = _string(1, norm_name) + _varint_field(3, 1 if add_dummy_prefix else 0)
    if remove_extra_whitespaces is not None:
        norm += _varint_field(4, 1 if remove_extra_whitespaces else 0)
    if escape_whitespaces is not None:
        norm += _varint_field(5, 1 if escape_whitespaces else 0)
    blob += _string(3, norm)
    return blob
