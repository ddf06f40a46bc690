"""All six reference-mirroring YAML recipes (configs/) must load, build
their model, initialize parameters, and run one tiny train step — the
config surface IS the user contract (SURVEY.md Appendix A)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from conformer_nemo_tpu.data.audio_io import write_wav
from conformer_nemo_tpu.data.tokenizers import train_bpe_tokenizer

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")

# shrink every recipe to test scale via the dotted-override surface
SMALL = {
    "model.encoder.n_layers": 1,
    "model.encoder.d_model": 32,
    "model.encoder.n_heads": 2,
    "model.encoder.ff_expansion_factor": 2,
    "model.encoder.conv_kernel_size": 7,
    "model.encoder.feat_in": 32,
    "model.preprocessor.features": 32,
    "model.train_ds.batch_size": 2,
}
SMALL_RNNT = {
    **SMALL,
    "model.model_defaults.pred_hidden": 16,
    "model.model_defaults.joint_hidden": 16,
    "model.model_defaults.enc_hidden": 32,
}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cfg_corpus")
    sr = 16000
    rng = np.random.RandomState(0)
    rows = []
    for i, text in enumerate(["giờ", "hỗ trợ", "ab ba", "ba ab"]):
        p = str(tmp / f"{i}.wav")
        write_wav(p, (rng.randn(4800) * 0.1).astype(np.float32), sr)
        rows.append({"audio_filepath": p, "duration": 0.3, "text": text})
    manifest = str(tmp / "m.json")
    with open(manifest, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    tok_dir = str(tmp / "tok")
    os.makedirs(tok_dir, exist_ok=True)
    train_bpe_tokenizer([r["text"] for r in rows] * 4, 64,
                        os.path.join(tok_dir, "tokenizer.json"))
    # multilang manifest rows carry a `lang` key routing to the agg
    # sub-tokenizer; per-language tokenizer dirs for the agg recipes
    ml_manifest = str(tmp / "m_ml.json")
    with open(ml_manifest, "w") as f:
        for i, r in enumerate(rows):
            f.write(json.dumps({**r, "lang": ["en", "es"][i % 2]}) + "\n")
    for lang in ("en", "es"):
        d = str(tmp / f"tok_{lang}")
        os.makedirs(d, exist_ok=True)
        train_bpe_tokenizer([r["text"] for r in rows] * 4, 64,
                            os.path.join(d, "tokenizer.json"))
    return {"manifest": manifest, "ml_manifest": ml_manifest,
            "tok": tok_dir, "dir": str(tmp)}


def _overrides(corpus, extra):
    o = dict(extra)
    o["model.train_ds.manifest_filepath"] = corpus["manifest"]
    o["model.validation_ds.manifest_filepath"] = corpus["manifest"]
    return o


def _fit_one_step(model):
    result = model.fit(max_steps=1, max_epochs=1)
    assert np.isfinite(result["last_loss"])
    return result


@pytest.mark.parametrize("name", ["conformer_ctc_char.yaml",
                                  "conformer_ctc_bpe.yaml",
                                  "conformer_ctc_bpe_longform.yaml",
                                  "conformer_ctc_bpe_streaming.yaml"])
def test_ctc_configs(name, corpus):
    from conformer_nemo_tpu.api import ConformerCTC

    kwargs = {}
    if "bpe" in name:
        kwargs["tokenizer_dir"] = corpus["tok"]
    model = ConformerCTC.from_config_file(
        os.path.join(CONFIGS, name), overrides=_overrides(corpus, SMALL),
        dtype=jnp.float32, **kwargs)
    _fit_one_step(model)


@pytest.mark.parametrize("name", ["conformer_transducer_char.yaml",
                                  "conformer_transducer_bpe.yaml"])
def test_transducer_configs(name, corpus):
    from conformer_nemo_tpu.api import ConformerTransducer

    kwargs = {}
    if "bpe" in name:
        kwargs["tokenizer_dir"] = corpus["tok"]
    model = ConformerTransducer.from_config_file(
        os.path.join(CONFIGS, name),
        overrides=_overrides(corpus, SMALL_RNNT),
        dtype=jnp.float32, **kwargs)
    _fit_one_step(model)


@pytest.mark.parametrize(
    "name,cls_name",
    [("conformer_ctc_bpe_multilang.yaml", "ConformerCTC"),
     ("conformer_transducer_bpe_multilang.yaml", "ConformerTransducer")])
def test_multilang_configs(name, cls_name, corpus):
    import conformer_nemo_tpu.api as api

    cls = getattr(api, cls_name)
    overrides = _overrides(
        corpus, SMALL if cls_name == "ConformerCTC" else SMALL_RNNT)
    overrides["model.train_ds.manifest_filepath"] = corpus["ml_manifest"]
    overrides["model.validation_ds.manifest_filepath"] = corpus["ml_manifest"]
    overrides.update({
        "model.tokenizer.type": "agg",
        "model.tokenizer.langs.en.dir": os.path.join(corpus["dir"], "tok_en"),
        "model.tokenizer.langs.en.type": "bpe",
        "model.tokenizer.langs.es.dir": os.path.join(corpus["dir"], "tok_es"),
        "model.tokenizer.langs.es.type": "bpe",
    })
    model = cls.from_config_file(os.path.join(CONFIGS, name),
                                 overrides=overrides, dtype=jnp.float32)
    _fit_one_step(model)
