"""End-to-end `.nemo` -> `.cntpu` conversion (scripts/convert_nemo.py).

Synthesizes a real `.nemo` archive (tar of model_config.yaml +
model_weights.ckpt, the `save_restore_connector.py:34-65` layout) from the
reference's own torch modules, converts it, restores via
`ConformerCTC.restore_portable` AND `from_pretrained`, and asserts the
restored flax model reproduces the torch log-probs.
"""

import os
import tarfile

import numpy as np
import pytest
import yaml

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from reference_torch import load_reference_modules
from test_nemo_parity import (
    D_MODEL, FEAT, LAYERS, VOCAB, RefEncoder, _randomize_bn_stats)

LABELS = [" ", "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k"]
assert len(LABELS) == VOCAB


def _make_nemo(tmp_path):
    mods = load_reference_modules()
    rng = np.random.RandomState(3)
    torch.manual_seed(3)
    enc = RefEncoder(mods)
    dec = torch.nn.Sequential(torch.nn.Conv1d(D_MODEL, VOCAB + 1, kernel_size=1))
    with torch.no_grad():
        _randomize_bn_stats(enc, rng)
    enc.eval(), dec.eval()

    sd = {"encoder." + k: v for k, v in enc.state_dict().items()}
    sd.update({"decoder.decoder_layers." + k: v for k, v in dec.state_dict().items()})

    cfg = {
        "sample_rate": 16000,
        "labels": LABELS,
        "preprocessor": {"_target_": "nemo...AudioToMelSpectrogramPreprocessor",
                         "features": FEAT, "window_size": 0.025,
                         "window_stride": 0.01, "normalize": "per_feature"},
        "encoder": {"_target_": "nemo...ConformerEncoder", "feat_in": FEAT,
                    "n_layers": LAYERS, "d_model": D_MODEL, "n_heads": 4,
                    "subsampling": "striding", "subsampling_factor": 4,
                    "conv_norm_type": "batch_norm", "dropout": 0.0,
                    "dropout_att": 0.0, "dropout_emb": 0.0},
        "decoder": {"_target_": "nemo...ConvASRDecoder", "feat_in": D_MODEL,
                    "num_classes": VOCAB},
        "train_ds": {"manifest_filepath": "???", "batch_size": 4},
        "optim": {"name": "adamw", "lr": 1.0},
    }
    work = tmp_path / "nemo_build"
    work.mkdir()
    with open(work / "model_config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    torch.save(sd, work / "model_weights.ckpt")
    nemo_path = str(tmp_path / "ref_model.nemo")
    with tarfile.open(nemo_path, "w:gz") as tar:
        for name in os.listdir(work):
            tar.add(work / name, arcname=name)
    return nemo_path, enc, dec


def test_convert_and_restore(tmp_path, monkeypatch):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    from convert_nemo import convert

    nemo_path, enc, dec = _make_nemo(tmp_path)
    out = str(tmp_path / "converted.cntpu")
    assert convert(nemo_path, out) == "ctc"

    from conformer_nemo_tpu.api import ConformerCTC

    model = ConformerCTC.restore_portable(out, dtype=jnp.float32)

    # identical features through both stacks
    rng = np.random.RandomState(4)
    b, t = 2, 57
    feats = rng.randn(b, FEAT, t).astype(np.float32)
    lens = np.array([t, 33], np.int32)
    with torch.no_grad():
        eo, ol = enc(torch.tensor(feats), torch.tensor(lens, dtype=torch.float32))
        ref_logp = torch.nn.functional.log_softmax(
            dec(eo.transpose(1, 2)).transpose(1, 2), dim=-1).numpy()

    from conformer_nemo_tpu.models.ctc_model import CTCModel

    variables = {"params": model.state.params}
    if model.state.batch_stats:
        variables["batch_stats"] = model.state.batch_stats
    ours, ours_lens = CTCModel(model.cfg).apply(
        variables, jnp.asarray(feats), jnp.asarray(lens), train=False)
    ours = np.asarray(ours)
    for i, L in enumerate(np.asarray(ours_lens)):
        assert np.max(np.abs(ours[i, :L] - ref_logp[i, :L])) < 3e-4

    # from_pretrained must serve the converted archive by name
    cache = tmp_path / "cache"
    cache.mkdir()
    os.rename(out, cache / "my_converted_model.cntpu")
    monkeypatch.setenv("CONFORMER_NEMO_TPU_CACHE", str(cache))
    m2 = ConformerCTC.from_pretrained("my_converted_model", dtype=jnp.float32)
    leaves1 = jnp.asarray(model.state.params["encoder"]["layers_0"]["self_attn"]["linear_q"]["kernel"])
    leaves2 = jnp.asarray(m2.state.params["encoder"]["layers_0"]["self_attn"]["linear_q"]["kernel"])
    np.testing.assert_array_equal(np.asarray(leaves1), np.asarray(leaves2))


def test_convert_multilang_aggregate_archive(tmp_path):
    """Multilang (aggregate-tokenizer) `.nemo` conversion: per-language
    md5-mangled tokenizer artifacts (mixins.py:236 registration) are carried
    into the portable archive under unique basenames, the restored model
    gets a working AggregateTokenizer with the reference's cumulative id
    offsets, and log-probs match torch."""
    import hashlib
    import shutil
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    from convert_nemo import convert

    fix = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
    sp_models = {"en": os.path.join(fix, "sp_bpe_bytefallback.model"),
                 "vi": os.path.join(fix, "sp_unigram.model")}

    from conformer_nemo_tpu.data.tokenizers import SentencePieceTokenizer

    sizes = {lang: SentencePieceTokenizer(p).vocab_size
             for lang, p in sp_models.items()}
    vocab_total = sum(sizes.values())

    mods = load_reference_modules()
    rng = np.random.RandomState(7)
    torch.manual_seed(7)
    enc = RefEncoder(mods)
    dec = torch.nn.Sequential(
        torch.nn.Conv1d(D_MODEL, vocab_total + 1, kernel_size=1))
    with torch.no_grad():
        _randomize_bn_stats(enc, rng)
    enc.eval(), dec.eval()

    sd = {"encoder." + k: v for k, v in enc.state_dict().items()}
    sd.update({"decoder.decoder_layers." + k: v for k, v in dec.state_dict().items()})

    work = tmp_path / "nemo_build"
    work.mkdir()
    langs_cfg = {}
    for lang, src in sp_models.items():
        md5 = hashlib.md5(open(src, "rb").read()).hexdigest()
        member = f"{md5}_tokenizer.model"
        shutil.copy(src, work / member)
        langs_cfg[lang] = {"type": "bpe", "dir": f"tok_{lang}",
                           "model_path": f"nemo:{member}"}
    cfg = {
        "sample_rate": 16000,
        "tokenizer": {"type": "agg", "langs": langs_cfg},
        "preprocessor": {"features": FEAT, "window_size": 0.025,
                         "window_stride": 0.01, "normalize": "per_feature"},
        "encoder": {"feat_in": FEAT, "n_layers": LAYERS, "d_model": D_MODEL,
                    "n_heads": 4, "subsampling": "striding",
                    "subsampling_factor": 4, "conv_norm_type": "batch_norm",
                    "dropout": 0.0, "dropout_att": 0.0, "dropout_emb": 0.0},
        "decoder": {"feat_in": D_MODEL, "num_classes": vocab_total},
        "train_ds": {"manifest_filepath": "???", "batch_size": 4},
        "optim": {"name": "adamw", "lr": 1.0},
    }
    with open(work / "model_config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    torch.save(sd, work / "model_weights.ckpt")
    nemo_path = str(tmp_path / "multilang.nemo")
    with tarfile.open(nemo_path, "w:gz") as tar:
        for name in os.listdir(work):
            tar.add(work / name, arcname=name)

    out = str(tmp_path / "multilang.cntpu")
    assert convert(nemo_path, out) == "ctc"

    from conformer_nemo_tpu.api import ConformerCTC
    from conformer_nemo_tpu.data.tokenizers import AggregateTokenizer

    model = ConformerCTC.restore_portable(out, dtype=jnp.float32)
    tok = model.tokenizer
    assert isinstance(tok, AggregateTokenizer)
    assert tok.vocab_size == vocab_total
    assert tok.offsets["vi"] == sizes["en"]
    # per-language encode routes through the right sub-tokenizer + offset
    en_ids = tok.text_to_ids("hello world", "en")
    vi_ids = tok.text_to_ids("hello world", "vi")
    assert en_ids and vi_ids and en_ids != vi_ids
    assert min(vi_ids) >= sizes["en"]
    assert tok.ids_to_text(en_ids) == "hello world"
    assert tok.ids_to_text(vi_ids) == "hello world"

    # numerical parity of the converted weights
    b, t = 2, 57
    feats = rng.randn(b, FEAT, t).astype(np.float32)
    lens = np.array([t, 33], np.int32)
    with torch.no_grad():
        eo, ol = enc(torch.tensor(feats), torch.tensor(lens, dtype=torch.float32))
        ref_logp = torch.nn.functional.log_softmax(
            dec(eo.transpose(1, 2)).transpose(1, 2), dim=-1).numpy()
    from conformer_nemo_tpu.models.ctc_model import CTCModel

    variables = {"params": model.state.params}
    if model.state.batch_stats:
        variables["batch_stats"] = model.state.batch_stats
    ours, ours_lens = CTCModel(model.cfg).apply(
        variables, jnp.asarray(feats), jnp.asarray(lens), train=False)
    ours = np.asarray(ours)
    for i, L in enumerate(np.asarray(ours_lens)):
        assert np.max(np.abs(ours[i, :L] - ref_logp[i, :L])) < 3e-4
