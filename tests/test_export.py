"""StableHLO export (the Exportable analogue, core/classes/exportable.py:37):
exported archives reload and reproduce the live model's outputs exactly."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from conformer_nemo_tpu.data.audio_io import write_wav
from conformer_nemo_tpu.utils.export import export_fn, load_exported, save_exported

from test_api_integration import TINY_CFG


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("export_corpus")
    sr = 16000
    rng = np.random.RandomState(0)
    entries = []
    for i, text in enumerate(["ab", "ba"]):
        n = int(0.4 * sr)
        p = str(tmp / f"{i}.wav")
        write_wav(p, (rng.randn(n) * 0.05).astype(np.float32), sr)
        entries.append({"audio_filepath": p, "duration": 0.4, "text": text})
    manifest = str(tmp / "manifest.json")
    with open(manifest, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    cfg_path = str(tmp / "cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(TINY_CFG.format(manifest=manifest, exp_dir=str(tmp / "exp")))
    return {"cfg": cfg_path, "dir": str(tmp)}


def test_export_roundtrip_primitive(tmp_path):
    def f(x, y):
        return jnp.tanh(x) @ y

    x = jnp.ones((2, 3), jnp.float32)
    y = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    exported = export_fn(f, (x, y))
    p = str(tmp_path / "f.tar.gz")
    save_exported(p, {"f": exported})
    fns = load_exported(p)
    np.testing.assert_allclose(np.asarray(fns["f"](x, y)),
                               np.asarray(f(x, y)), rtol=1e-6)


def test_ctc_export(tiny_cfg, tmp_path):
    from conformer_nemo_tpu.api import ConformerCTC

    model = ConformerCTC.from_config_file(tiny_cfg["cfg"], dtype=jnp.float32)
    p = str(tmp_path / "ctc_export.tar.gz")
    model.export(p, batch_size=2, seconds=0.5)
    fns = load_exported(p)
    assert set(fns) == {"forward"}

    rng = np.random.RandomState(1)
    audio = jnp.asarray(rng.randn(2, 8000).astype(np.float32) * 0.1)
    lens = jnp.asarray([8000, 6000], jnp.int32)
    lp, el = fns["forward"](audio, lens)

    # oracle: the live model's own forward
    exp_fns = model._export_functions(2, 8000)
    lp2, el2 = exp_fns["forward"][0](audio, lens)
    np.testing.assert_array_equal(np.asarray(el), np.asarray(el2))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2),
                               rtol=1e-5, atol=1e-5)


def test_rnnt_export(tiny_cfg, tmp_path):
    from conformer_nemo_tpu.api import ConformerTransducer

    with open(tiny_cfg["cfg"]) as f:
        raw = yaml.safe_load(f)
    m = raw["model"]
    m["decoder"] = {"prednet": {"pred_hidden": 16, "pred_rnn_layers": 1,
                                "dropout": 0.0}}
    m["joint"] = {"fuse_loss_wer": False,
                  "jointnet": {"joint_hidden": 16, "activation": "relu",
                               "dropout": 0.0}}
    cfg2 = str(tmp_path / "rnnt.yaml")
    with open(cfg2, "w") as f:
        yaml.safe_dump(raw, f)

    model = ConformerTransducer.from_config_file(cfg2, dtype=jnp.float32)
    p = str(tmp_path / "rnnt_export.tar.gz")
    model.export(p, batch_size=2, seconds=0.5)
    fns = load_exported(p)
    assert set(fns) == {"encoder", "decoder_joint"}

    rng = np.random.RandomState(2)
    audio = jnp.asarray(rng.randn(2, 8000).astype(np.float32) * 0.1)
    lens = jnp.asarray([8000, 8000], jnp.int32)
    enc, enc_lens = fns["encoder"](audio, lens)
    assert enc.shape[0] == 2 and enc.shape[2] == 32

    # drive one greedy step through the exported decoder_joint
    mcfg = model.cfg.model
    h = jnp.zeros((1, 2, 16), jnp.float32)
    c = jnp.zeros((1, 2, 16), jnp.float32)
    blank = jnp.full((2,), mcfg.blank_id, jnp.int32)
    logits, nh, nc = fns["decoder_joint"](
        jnp.asarray(np.asarray(enc[:, 0, :]), jnp.float32), blank, h, c)
    assert logits.shape == (2, mcfg.num_classes_with_blank)
    assert nh.shape == h.shape and nc.shape == c.shape

    # oracle parity with the live step
    live = model._export_functions(2, 8000)["decoder_joint"][0]
    logits2, nh2, nc2 = live(
        jnp.asarray(np.asarray(enc[:, 0, :]), jnp.float32), blank, h, c)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nh), np.asarray(nh2), rtol=1e-5,
                               atol=1e-6)
