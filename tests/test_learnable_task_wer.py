"""End-to-end learnability: on a synthetic tone->letter task the full
pipeline (wav -> features -> conformer -> CTC -> greedy -> WER) must reach
0 WER. This is the strongest full-stack correctness check we can run
hermetically (the analogue of the reference's AN4 smoke trainings)."""

import json

import jax
import numpy as np
import pytest

from conformer_nemo_tpu.data.audio_io import write_wav

TONES = {"a": 400.0, "b": 900.0, "c": 1800.0}
SR = 16000
SEG = 0.12  # seconds per letter segment


def synth_utterance(text: str, rng) -> np.ndarray:
    segs = []
    for ch in text.replace(" ", ""):
        f = TONES[ch]
        t = np.arange(int(SEG * SR)) / SR
        tone = 0.3 * np.sin(2 * np.pi * f * t)
        segs.append(tone + rng.randn(len(t)) * 0.01)
    return np.concatenate(segs).astype(np.float32)


@pytest.fixture(scope="module")
def tone_corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tones")
    rng = np.random.RandomState(0)
    texts = ["ab", "ba", "ca", "ac", "bc", "cb", "abc", "cab", "ba", "ab",
             "aa", "bb", "cc", "abc", "cba", "bac"]
    entries = []
    for i, text in enumerate(texts):
        wav = synth_utterance(text, rng)
        p = str(tmp / f"{i}.wav")
        write_wav(p, wav, SR)
        entries.append({
            "audio_filepath": p, "duration": len(wav) / SR, "text": text,
        })
    man = str(tmp / "manifest.json")
    with open(man, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    return man, texts


def test_tone_task_reaches_zero_wer(tone_corpus):
    import jax.numpy as jnp

    from conformer_nemo_tpu.audio.features import MelFeatureConfig
    from conformer_nemo_tpu.audio.spec_augment import SpecAugmentConfig
    from conformer_nemo_tpu.data.dataset import BucketedAudioTextDataset, BucketedLoader
    from conformer_nemo_tpu.data.manifest import read_manifest
    from conformer_nemo_tpu.data.tokenizers import CharTokenizer
    from conformer_nemo_tpu.models.conformer import ConformerEncoderConfig
    from conformer_nemo_tpu.models.ctc_model import CTCModelConfig
    from conformer_nemo_tpu.train.lr_schedule import make_lr_schedule
    from conformer_nemo_tpu.train.optim import make_optimizer
    from conformer_nemo_tpu.train.trainer import (
        evaluate_wer, init_ctc_state, make_ctc_eval_step, make_ctc_train_step,
    )

    man, texts = tone_corpus
    tok = CharTokenizer([" ", "a", "b", "c"])
    cfg = CTCModelConfig(
        preprocessor=MelFeatureConfig(features=32, dither=0.0),
        spec_augment=SpecAugmentConfig(),
        encoder=ConformerEncoderConfig(
            feat_in=32, n_layers=1, d_model=32, n_heads=2, ff_expansion_factor=2,
            conv_kernel_size=7, conv_norm_type="layer_norm", dropout=0.0,
            dropout_att=0.0, dtype=jnp.float32,
        ),
        num_classes=tok.vocab_size,
    )
    sched = make_lr_schedule({"name": "NoamAnnealing", "d_model": 32, "warmup_steps": 30}, 1.0)
    opt = make_optimizer("adamw", sched, weight_decay=0.0, grad_clip=1.0)
    state = init_ctc_state(cfg, opt, jax.random.PRNGKey(0), (1, 32, 64))
    step = make_ctc_train_step(cfg, opt)

    samples = read_manifest(man)
    ds = BucketedAudioTextDataset(samples, tok, n_buckets=1)
    loader = BucketedLoader(ds, batch_size=16, shuffle=True, seed=0,
                            bucketing_strategy="fully_randomized")
    losses = []
    for epoch in range(60):
        for batch in loader:
            bd = {
                "audio": batch.audio, "audio_lens": batch.audio_lens,
                "tokens": batch.tokens, "token_lens": batch.token_lens,
            }
            state, m = step(state, bd)
            losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()

    eval_loader = BucketedLoader(ds, batch_size=16, shuffle=False)
    res = evaluate_wer(cfg, state, eval_loader, tok, make_ctc_eval_step(cfg))
    assert res["wer"] <= 0.10, (res, losses[::20])
