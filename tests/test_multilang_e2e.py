"""Multilang (aggregate tokenizer) end-to-end: per-language BPE tokenizers
with id offsets, lang-routed encoding from the manifest, fit + eval."""

import json
import os

import numpy as np
import pytest

from conformer_nemo_tpu.data.audio_io import write_wav
from conformer_nemo_tpu.data.tokenizers import build_tokenizer, train_bpe_tokenizer

ML_CFG = """
name: "tiny-ml"
model:
  sample_rate: 16000
  ctc_reduction: 'mean_batch'
  train_ds:
    manifest_filepath: {manifest}
    sample_rate: 16000
    batch_size: 2
    num_buckets: 1
  validation_ds:
    manifest_filepath: {manifest}
    sample_rate: 16000
    batch_size: 2
  tokenizer:
    type: agg
    langs:
      en:
        dir: {en_dir}
        type: bpe
      es:
        dir: {es_dir}
        type: bpe
  preprocessor:
    sample_rate: 16000
    features: 32
    dither: 0.0
  spec_augment:
    freq_masks: 0
    time_masks: 0
  encoder:
    feat_in: 32
    n_layers: 1
    d_model: 32
    n_heads: 2
    ff_expansion_factor: 2
    conv_kernel_size: 7
    conv_norm_type: 'layer_norm'
    dropout: 0.0
    dropout_att: 0.0
  optim:
    name: adamw
    lr: 0.2
    sched: {{name: NoamAnnealing, d_model: 32, warmup_steps: 20}}
trainer:
  max_epochs: 1
  log_every_n_steps: 5
"""


@pytest.fixture(scope="module")
def ml_corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ml")
    en_dir, es_dir = str(tmp / "tok_en"), str(tmp / "tok_es")
    os.makedirs(en_dir), os.makedirs(es_dir)
    train_bpe_tokenizer(
        ["the cat sat", "the dog ran", "a cat and a dog"] * 30, 48,
        os.path.join(en_dir, "tokenizer.json"),
    )
    train_bpe_tokenizer(
        ["el gato corre", "el perro salta", "un gato y un perro"] * 30, 48,
        os.path.join(es_dir, "tokenizer.json"),
    )
    sr = 16000
    rng = np.random.RandomState(0)
    entries = []
    data = [("the cat", "en"), ("el gato", "es"), ("a dog", "en"), ("un perro", "es")]
    for i, (text, lang) in enumerate(data):
        n = int(0.5 * sr)
        p = str(tmp / f"{i}.wav")
        write_wav(p, (rng.randn(n) * 0.05).astype(np.float32), sr)
        entries.append({"audio_filepath": p, "duration": 0.5, "text": text, "lang": lang})
    manifest = str(tmp / "manifest.json")
    with open(manifest, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    cfg_path = str(tmp / "cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(ML_CFG.format(manifest=manifest, en_dir=en_dir, es_dir=es_dir))
    return {"cfg": cfg_path, "manifest": manifest, "en_dir": en_dir, "es_dir": es_dir}


def test_aggregate_tokenizer_routing(ml_corpus):
    tok = build_tokenizer({
        "type": "agg",
        "langs": {
            "en": {"dir": ml_corpus["en_dir"], "type": "bpe"},
            "es": {"dir": ml_corpus["es_dir"], "type": "bpe"},
        },
    })
    en_ids = tok.text_to_ids("the cat", "en")
    es_ids = tok.text_to_ids("el gato", "es")
    assert max(en_ids) < tok.offsets["es"]
    assert min(es_ids) >= tok.offsets["es"]
    assert tok.ids_to_text(en_ids).strip() == "the cat"
    assert tok.ids_to_text(es_ids).strip() == "el gato"


def test_multilang_fit_and_eval(ml_corpus):
    import jax.numpy as jnp

    from conformer_nemo_tpu.api import ConformerCTC

    model = ConformerCTC.from_config_file(ml_corpus["cfg"], dtype=jnp.float32)
    assert model.cfg.num_classes == model.tokenizer.vocab_size
    result = model.fit(max_epochs=1)
    assert np.isfinite(result["last_loss"])
    hyps = model.transcribe([ml_corpus["manifest"].replace("manifest.json", "0.wav")])
    assert isinstance(hyps[0], str)
