"""Exact SentencePiece encoding: merge-order BPE + normalization.

The image has no `sentencepiece` package, so the oracle here is the
documented algorithm itself (bpe_model.cc: repeatedly merge the adjacent
pair whose merged piece scores highest, ties -> leftmost; scores in BPE
models encode merge rank) with hand-derived expected ids on a synthesized
ModelProto, including a case where greedy-merge BPE and Viterbi unigram
DISAGREE — proving the BPE code path is exercised, not approximated.
"""

import pytest

from conformer_nemo_tpu.data.tokenizers import SentencePieceTokenizer
from sp_proto import SP, make_model


def _write(tmp_path, pieces, **kw):
    p = tmp_path / "tokenizer.model"
    p.write_bytes(make_model(pieces, **kw))
    return SentencePieceTokenizer(str(p))


@pytest.fixture
def bpe_tok(tmp_path):
    # BPE scores = -merge_rank (merged pieces); base symbols score 0
    pieces = [
        ("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3),
        (SP, 0.0, 1), ("a", 0.0, 1), ("b", 0.0, 1), ("c", 0.0, 1),
        ("ab", -1.0, 1),      # merge rank 1
        ("abc", -2.0, 1),     # merge rank 2 (ab + c)
        ("bc", -3.0, 1),      # merge rank 3
        (SP + "a", -4.0, 1),  # merge rank 4
    ]
    return _write(tmp_path, pieces, model_type=2)


def test_bpe_merge_order_beats_viterbi(bpe_tok):
    # BPE: chars [_,a,b,c]; best pair 'ab'(-1) -> [_,ab,c]; then 'abc'(-2)
    # -> [_,abc]; then '_a'? no ('_'+'abc' not a piece). ids: [_, abc]
    ids = bpe_tok.text_to_ids("abc")
    assert ids == [3, 8], ids
    # Viterbi over the same vocab would prefer _ + ab + c (score -1 > -2):
    # proves the merge-order path (not max-score segmentation) is used.


def test_bpe_leftmost_tie_break(tmp_path):
    pieces = [
        ("<unk>", 0.0, 2), (SP, 0.0, 1), ("a", 0.0, 1), ("b", 0.0, 1),
        ("ab", -1.0, 1), ("ba", -1.0, 1),  # equal scores
    ]
    tok = _write(tmp_path, pieces, model_type=2)
    # "aba": pairs ab(-1)@1, ba(-1)@2 -> tie, leftmost first: [_, ab, a]
    assert tok.ids_to_tokens(tok.text_to_ids("aba")) == [SP, "ab", "a"]
    # "bab": ba@1, ab@2 -> leftmost: [_, ba, b]
    assert tok.ids_to_tokens(tok.text_to_ids("bab")) == [SP, "ba", "b"]


def test_bpe_merge_then_remerge(bpe_tok):
    # "ababc": ab@1(-1), ab@3(-1) both rank1, leftmost first; then abc from
    # the second ab + c; final [_, ab, abc]
    assert bpe_tok.ids_to_tokens(bpe_tok.text_to_ids("ababc")) == [SP, "ab", "abc"]


def test_bpe_space_and_dummy_prefix(bpe_tok):
    # "a b" -> "_a_b" after normalize; merge _a(-4): [_a, _, b]
    assert bpe_tok.ids_to_tokens(bpe_tok.text_to_ids("a b")) == [SP + "a", SP, "b"]
    # extra whitespace removal
    assert bpe_tok.text_to_ids("  a   b ") == bpe_tok.text_to_ids("a b")


def test_bpe_unknown_char(bpe_tok):
    # '_'+'a' merges to the rank-4 piece before hitting the OOV char
    ids = bpe_tok.text_to_ids("aZb")
    toks = bpe_tok.ids_to_tokens(ids)
    assert toks == [SP + "a", "<unk>", "b"]
    assert ids[1] == 0  # unk id


def test_byte_fallback(tmp_path):
    pieces = [("<unk>", 0.0, 2), (SP, 0.0, 1), ("a", 0.0, 1)]
    pieces += [("<0x%02X>" % b, 0.0, 6) for b in range(256)]
    tok = _write(tmp_path, pieces, model_type=2, byte_fallback=True)
    ids = tok.text_to_ids("aé")  # é = 0xC3 0xA9 in UTF-8
    toks = tok.ids_to_tokens(ids)
    assert toks == [SP, "a", "<0xC3>", "<0xA9>"]


def test_byte_fallback_decode_roundtrip(tmp_path):
    """ids_to_text reassembles '<0xNN>' pieces into UTF-8 bytes (real
    sentencepiece DecodePieces semantics), not literal '<0xNN>' text."""
    pieces = [("<unk>", 0.0, 2), (SP, 0.0, 1), ("a", 0.0, 1)]
    pieces += [("<0x%02X>" % b, 0.0, 6) for b in range(256)]
    tok = _write(tmp_path, pieces, model_type=2, byte_fallback=True)
    ids = tok.text_to_ids("aé")
    assert tok.ids_to_text(ids) == "aé"
    # multi-char OOV run (CJK: 3 bytes each) reassembles too
    ids = tok.text_to_ids("a语音")
    assert tok.ids_to_text(ids) == "a语音"
    # a non-byte-fallback model keeps literal pieces untouched
    tok2 = _write(tmp_path, [("<unk>", 0.0, 2), (SP, 0.0, 1), ("a", 0.0, 1),
                             ("<0xC3>", 0.0, 1)], model_type=2)
    assert tok2.ids_to_text([3]) == "<0xC3>"


def test_control_pieces_never_match(tmp_path):
    pieces = [("<unk>", 0.0, 2), (SP, 0.0, 1), ("a", 0.0, 1),
              ("<s>", 10.0, 3)]
    tok = _write(tmp_path, pieces, model_type=2)
    ids = tok.text_to_ids("<s>")
    assert 3 not in ids  # control piece id never produced from raw text


def test_unigram_viterbi_still_used(tmp_path):
    # model_type=1 (unigram): max-sum-of-scores segmentation, which differs
    # from BPE merge order — 'abc' as one piece (-2) beats ab+c (-1-5)
    pieces = [
        ("<unk>", 0.0, 2), (SP, -5.0, 1), ("a", -5.0, 1), ("b", -5.0, 1),
        ("c", -5.0, 1), ("ab", -1.0, 1), ("abc", -2.0, 1),
    ]
    tok = _write(tmp_path, pieces, model_type=1)
    assert tok.ids_to_tokens(tok.text_to_ids("abc")) == [SP, "abc"]
    # a BPE (model_type=2) tokenizer over the same vocab merges ab first and
    # can never produce [_, abc]? it CAN (ab+c -> abc). But on 'abx' the
    # unigram result a+b differs from BPE's ab:
    tok2 = _write(tmp_path, [
        ("<unk>", 0.0, 2), (SP, -5.0, 1), ("a", -1.0, 1), ("b", -1.0, 1),
        ("ab", -10.0, 1),
    ], model_type=1)
    assert tok2.ids_to_tokens(tok2.text_to_ids("ab")) == [SP, "a", "b"]


def test_nfkc_normalization(bpe_tok):
    # fullwidth 'ａｂｃ' NFKC-normalizes to 'abc'
    assert bpe_tok.text_to_ids("ａｂｃ") == bpe_tok.text_to_ids("abc")


def test_roundtrip_decode(bpe_tok):
    assert bpe_tok.ids_to_text(bpe_tok.text_to_ids("ab cabc")) == "ab cabc"


def test_nmt_controls_deleted_not_spaced(bpe_tok):
    # builder.cc BuildNmtNFKCMap: C0/C1 controls are DELETED...
    assert bpe_tok.text_to_ids("a\x01b") == bpe_tok.text_to_ids("ab")
    assert bpe_tok.text_to_ids("a\x7fb") == bpe_tok.text_to_ids("ab")
    # ...while the whitespace family (incl. zero-widths U+200B-U+200F and
    # tab/LF/CR) maps to ' '
    for ws in ("​", "\t", "\n", "\r", "　", " "):
        assert bpe_tok.text_to_ids(f"a{ws}b") == bpe_tok.text_to_ids("a b"), repr(ws)
