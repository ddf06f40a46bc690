"""from_pretrained / list_available_models surface (reference common.py:610)."""
import os

import pytest

from conformer_nemo_tpu.pretrained import resolve_pretrained, list_available_models


def test_list_available_models():
    from conformer_nemo_tpu.api import ConformerCTC, ConformerTransducer

    names = [i.pretrained_model_name for i in ConformerCTC.list_available_models()]
    assert "stt_en_conformer_ctc_large" in names
    assert "QuartzNet15x5Base-En" in names
    tnames = [i.pretrained_model_name for i in ConformerTransducer.list_available_models()]
    assert "stt_zh_conformer_transducer_large" in tnames


def test_resolve_missing_raises_actionable():
    with pytest.raises(FileNotFoundError, match="no archive found"):
        resolve_pretrained("stt_en_conformer_ctc_large", cache_dir="/nonexistent")


def test_resolve_from_cache_dir_and_path(tmp_path):
    p = tmp_path / "stt_en_conformer_ctc_small.cntpu"
    p.write_bytes(b"x")
    assert resolve_pretrained("stt_en_conformer_ctc_small", cache_dir=str(tmp_path)) == str(p)
    assert resolve_pretrained(str(p)) == str(p)


def test_env_cache_dir(tmp_path, monkeypatch):
    p = tmp_path / "QuartzNet15x5Base-En.cntpu"
    p.write_bytes(b"x")
    monkeypatch.setenv("CONFORMER_NEMO_TPU_CACHE", str(tmp_path))
    assert resolve_pretrained("QuartzNet15x5Base-En") == str(p)


def test_from_pretrained_end_to_end(tmp_path):
    # save a tiny model as a named archive, then load it via from_pretrained
    from conformer_nemo_tpu.api import ConformerCTC
    from conformer_nemo_tpu.data.tokenizers import CharTokenizer

    cfg = {
        "model": {
            "labels": list("ab "),
            "preprocessor": {"features": 32},
            "encoder": {"feat_in": 32, "n_layers": 1, "d_model": 32, "n_heads": 2,
                        "subsampling_conv_channels": 32},
            "decoder": {"num_classes": 3},
        }
    }
    m = ConformerCTC(cfg, CharTokenizer(list("ab ")))
    m.state = m._init_state(m._make_optimizer())
    arch = tmp_path / "stt_en_conformer_ctc_small.cntpu"
    m.save_portable(str(arch))
    m2 = ConformerCTC.from_pretrained("stt_en_conformer_ctc_small", cache_dir=str(tmp_path))
    assert m2.tokenizer.ids_to_text(m2.tokenizer.text_to_ids("ab")) == "ab"
