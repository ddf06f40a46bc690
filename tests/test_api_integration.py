"""Full-pipeline integration: config file -> model -> fit -> transcribe ->
portable save/restore (the framework's fast_dev_run analogue)."""

import json
import os

import numpy as np
import pytest

from conformer_nemo_tpu.data.audio_io import write_wav

TINY_CFG = """
name: "tiny-ctc-char"
model:
  sample_rate: 16000
  labels: [" ", "a", "b"]
  ctc_reduction: 'mean_batch'
  train_ds:
    manifest_filepath: {manifest}
    sample_rate: 16000
    batch_size: 2
    shuffle: true
    min_duration: 0.05
    max_duration: 20.0
    num_buckets: 2
  validation_ds:
    manifest_filepath: {manifest}
    sample_rate: 16000
    batch_size: 2
  preprocessor:
    sample_rate: 16000
    features: 32
    n_fft: 512
    window_size: 0.025
    window_stride: 0.01
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
    lr: 0.5
    betas: [0.9, 0.98]
    weight_decay: 0.0
    sched:
      name: NoamAnnealing
      d_model: 32
      warmup_steps: 20
      min_lr: 1e-6
trainer:
  max_epochs: 1
  log_every_n_steps: 5
  gradient_clip_val: 1.0
exp_manager:
  exp_dir: {exp_dir}
  name: tiny
  resume_if_exists: false
"""


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("corpus")
    sr = 16000
    rng = np.random.RandomState(0)
    entries = []
    texts = ["ab", "ba", "a b", "b a", "ab ba", "a", "b", "aa"]
    for i, text in enumerate(texts):
        dur = 0.4 + 0.1 * (i % 3)
        n = int(dur * sr)
        wav = (rng.randn(n) * 0.05).astype(np.float32)
        p = str(tmp / f"{i}.wav")
        write_wav(p, wav, sr)
        entries.append({"audio_filepath": p, "duration": dur, "text": text})
    manifest = str(tmp / "manifest.json")
    with open(manifest, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    cfg_path = str(tmp / "cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(TINY_CFG.format(manifest=manifest, exp_dir=str(tmp / "exp")))
    return {"manifest": manifest, "cfg": cfg_path, "dir": str(tmp)}


def test_fit_transcribe_save_restore(corpus):
    import jax.numpy as jnp

    from conformer_nemo_tpu.api import ConformerCTC
    from conformer_nemo_tpu.train.exp_manager import ExpManagerConfig, ExperimentManager

    model = ConformerCTC.from_config_file(corpus["cfg"], dtype=jnp.float32)
    em = ExperimentManager(
        ExpManagerConfig(exp_dir=os.path.join(corpus["dir"], "exp"), name="t", save_top_k=2)
    )
    result = model.fit(max_epochs=2, exp_manager=em)
    assert result["steps"] >= 2
    assert np.isfinite(result["last_loss"])

    # transcribe runs end to end (quality not asserted at 2 epochs)
    wavs = [os.path.join(corpus["dir"], "0.wav"), os.path.join(corpus["dir"], "1.wav")]
    hyps = model.transcribe(wavs, batch_size=2)
    assert len(hyps) == 2
    assert all(isinstance(h, str) for h in hyps)

    # portable roundtrip preserves transcription behavior
    art = os.path.join(corpus["dir"], "model.cntpu")
    model.save_portable(art)
    model2 = ConformerCTC.restore_portable(art, dtype=jnp.float32)
    hyps2 = model2.transcribe(wavs, batch_size=2)
    assert hyps2 == hyps

    # checkpoints + metrics written
    assert os.path.exists(os.path.join(em.run_dir, "metrics.jsonl"))
    assert os.path.exists(os.path.join(em.ckpt_dir, "last"))


def test_cli_fast_dev_run(corpus):
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    proc = subprocess.run(
        [
            sys.executable, "scripts/speech_to_text_ctc.py",
            "--config", corpus["cfg"],
            f"model.train_ds.manifest_filepath={corpus['manifest']}",
            "+fast_dev_run=true",
        ],
        capture_output=True, text=True, timeout=500,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "done:" in proc.stdout


def test_change_vocabulary(corpus):
    import jax.numpy as jnp
    from conformer_nemo_tpu.api import ConformerCTC
    from conformer_nemo_tpu.data.tokenizers import CharTokenizer

    model = ConformerCTC.from_config_file(corpus["cfg"], dtype=jnp.float32)
    model.state = model._init_state(model._make_optimizer())
    old_enc = model.state.params["encoder"]
    new_tok = CharTokenizer([" ", "a", "b", "c", "d"])
    model.change_vocabulary(new_tok)
    assert model.cfg.num_classes == 5
    import jax, numpy as np
    a = jax.tree.leaves(old_enc)[0]
    b = jax.tree.leaves(model.state.params["encoder"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rnnt_api_fit_and_portable(corpus, tmp_path_factory):
    """Transducer API end-to-end: config -> fit -> transcribe -> portable."""
    import jax.numpy as jnp
    import yaml

    from conformer_nemo_tpu.api import ConformerTransducer

    with open(corpus["cfg"]) as f:
        raw = yaml.safe_load(f)
    m = raw["model"]
    m["decoder"] = {"prednet": {"pred_hidden": 16, "pred_rnn_layers": 1, "dropout": 0.0}}
    m["joint"] = {"fuse_loss_wer": False,
                  "jointnet": {"joint_hidden": 16, "activation": "relu", "dropout": 0.0}}
    m["decoding"] = {"strategy": "greedy_batch", "greedy": {"max_symbols": 3}}
    cfg2 = str(tmp_path_factory.mktemp("rnnt_cfg") / "cfg.yaml")
    with open(cfg2, "w") as f:
        yaml.safe_dump(raw, f)

    model = ConformerTransducer.from_config_file(cfg2, dtype=jnp.float32)
    result = model.fit(max_epochs=1)
    assert np.isfinite(result["last_loss"])
    wavs = [os.path.join(corpus["dir"], "0.wav")]
    hyps = model.transcribe(wavs, batch_size=2)
    assert isinstance(hyps[0], str)

    art = str(tmp_path_factory.mktemp("rnnt_art") / "model.cntpu")
    model.save_portable(art)
    model2 = ConformerTransducer.restore_portable(art, dtype=jnp.float32)
    assert model2.transcribe(wavs, batch_size=2) == hyps


def test_rnnt_change_decoding_strategy(corpus, tmp_path_factory):
    """decoding.strategy drives transcribe() through the RNNTDecoding facade;
    change_decoding_strategy swaps it without touching weights
    (rnnt_models.py:403 parity)."""
    import jax.numpy as jnp
    import yaml

    from conformer_nemo_tpu.api import ConformerTransducer

    with open(corpus["cfg"]) as f:
        raw = yaml.safe_load(f)
    m = raw["model"]
    m["decoder"] = {"prednet": {"pred_hidden": 16, "pred_rnn_layers": 1,
                                "dropout": 0.0}}
    m["joint"] = {"fuse_loss_wer": False,
                  "jointnet": {"joint_hidden": 16, "activation": "relu",
                               "dropout": 0.0}}
    m["decoding"] = {"strategy": "greedy_batch", "greedy": {"max_symbols": 3}}
    cfg2 = str(tmp_path_factory.mktemp("rnnt_dec") / "cfg.yaml")
    with open(cfg2, "w") as f:
        yaml.safe_dump(raw, f)
    model = ConformerTransducer.from_config_file(cfg2, dtype=jnp.float32)
    model.fit(max_epochs=2)
    wavs = [os.path.join(corpus["dir"], "0.wav"),
            os.path.join(corpus["dir"], "1.wav")]
    g = model.transcribe(wavs, batch_size=2)
    model.change_decoding_strategy(
        {"strategy": "beam_batch", "beam": {"beam_size": 2,
                                            "tsd_max_sym_exp": 2}})
    b = model.transcribe(wavs, batch_size=2)
    assert len(g) == len(b) == 2
    assert all(isinstance(x, str) for x in g + b)


def test_rnnt_change_vocabulary(corpus):
    """Transducer change_vocabulary keeps encoder params, resizes pred/joint
    (reference EncDecRNNTModel.change_vocabulary, rnnt_models.py:285)."""
    import jax, numpy as np
    import jax.numpy as jnp
    import yaml
    from conformer_nemo_tpu.api import ConformerTransducer
    from conformer_nemo_tpu.data.tokenizers import CharTokenizer

    with open(corpus["cfg"]) as f:
        raw = yaml.safe_load(f)
    model = ConformerTransducer(
        {"model": {**raw["model"],
                   "decoder": {"prednet": {"pred_hidden": 32, "pred_rnn_layers": 1}},
                   "joint": {"jointnet": {"joint_hidden": 32}}},
         "trainer": raw.get("trainer", {})},
        CharTokenizer([" ", "a", "b"]), dtype=jnp.float32)
    model.state = model._init_state(model._make_optimizer())
    old_enc = model.state.params["encoder"]
    old_embed = model.state.params["decoder"]["embed"]["embedding"].shape

    model.change_vocabulary(CharTokenizer([" ", "a", "b", "c", "d"]))
    assert model.cfg.model.decoder.vocab_size == 5
    new_embed = model.state.params["decoder"]["embed"]["embedding"].shape
    assert new_embed[0] == 6 and old_embed[0] == 4  # +1 blank row
    a = jax.tree.leaves(old_enc)[0]
    b = jax.tree.leaves(model.state.params["encoder"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_transcribe_logprobs_and_hypotheses(corpus):
    """transcribe(logprobs=True / return_hypotheses=True) parity surface
    (reference ctc_models.transcribe kwargs, ctc_models.py:215)."""
    import jax.numpy as jnp
    import numpy as np
    from conformer_nemo_tpu.api import ConformerCTC, TranscriptionHypothesis

    model = ConformerCTC.from_config_file(corpus["cfg"], dtype=jnp.float32)
    model.state = model._init_state(model._make_optimizer())
    import json as _json
    with open(corpus["manifest"]) as f:
        paths = [_json.loads(l)["audio_filepath"] for l in f][:2]

    lps = model.transcribe(paths, batch_size=2, logprobs=True)
    assert len(lps) == 2
    for lp in lps:
        assert lp.ndim == 2 and lp.shape[1] == model.cfg.num_classes + 1
        # log-softmax rows normalize
        np.testing.assert_allclose(np.exp(lp).sum(-1), 1.0, atol=1e-3)

    hyps = model.transcribe(paths, batch_size=2, return_hypotheses=True)
    texts = model.transcribe(paths, batch_size=2)
    for h, t in zip(hyps, texts):
        assert isinstance(h, TranscriptionHypothesis)
        assert h.text == t
        assert h.text == model.tokenizer.ids_to_text(h.y_sequence)


def test_longform_transcribe_exact_path(corpus, tmp_path):
    """Long-form routing in transcribe (VERDICT r4 #4): utterances above
    longform_threshold_s take an EXACT whole-utterance forward — one file
    per batch row, padded to the geometric (threshold x 2^k) length
    schedule — while short files keep the shared bucket-padded batches.
    The long file's text must equal the plain exact-length decode (no
    chunk-merge heuristics involved)."""
    import jax.numpy as jnp

    from conformer_nemo_tpu.api import ConformerCTC

    model = ConformerCTC.from_config_file(corpus["cfg"], dtype=jnp.float32)
    model.state = model._init_state(model._make_optimizer())
    sr = 16000
    rng = np.random.RandomState(7)
    long_wav = (rng.randn(int(3.3 * sr)) * 0.05).astype(np.float32)
    long_path = str(tmp_path / "long.wav")
    write_wav(long_path, long_wav, sr)
    import json as _json
    with open(corpus["manifest"]) as f:
        short_paths = [_json.loads(l)["audio_filepath"] for l in f][:3]

    calls = []
    orig = model._decode_audio_batch

    def spy(audio, lens, mode="text"):
        calls.append((audio.shape, np.asarray(lens).copy()))
        return orig(audio, lens, mode=mode)

    model._decode_audio_batch = spy
    out = model.transcribe(short_paths + [long_path], batch_size=2,
                           longform_threshold_s=2.0)
    assert len(out) == 4 and all(isinstance(t, str) for t in out)

    long_calls = [(s, l) for s, l in calls if s[0] == 1]
    assert len(long_calls) == 1
    (b, t_cap), lens = long_calls[0]
    # 3.3 s > 2 s threshold -> next geometric bucket is 4 s
    assert t_cap == int(2.0 * sr) * 2 and lens[0] == len(long_wav)
    # short files stayed on the batch_size-row bucket path
    assert all(s[0] == 2 for s, _ in calls if (s, _) not in long_calls)

    # exactness: equals the plain exact-length decode of the same audio
    model._decode_audio_batch = orig
    audio = long_wav[None, :]
    direct = orig(audio, np.array([len(long_wav)], np.int32))[0]
    assert out[3] == direct
    # and a high threshold routes it through the ordinary path, same text
    assert model.transcribe([long_path], batch_size=1)[0] == direct
