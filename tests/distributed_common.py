"""Shared fixtures for the multi-process test: tiny model + corpus loading.

Used by both the pytest process (single-process reference value) and the
spawned distributed_worker.py processes, so both sides run IDENTICAL code.
"""

import json
import os

import numpy as np

FEAT = 16
LOCAL_BATCH = 4
N_SAMPLES = 8
SR = 16000


def build_corpus(root: str) -> str:
    """8 deterministic half-second WAVs + manifest. Returns manifest path."""
    from conformer_nemo_tpu.data.audio_io import write_wav

    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(42)
    mpath = os.path.join(root, "manifest.json")
    texts = ["ab", "ba", "aa", "bb", "ab a", "b ab", "a", "b"]
    with open(mpath, "w") as f:
        for i, text in enumerate(texts):
            n = SR // 2
            p = os.path.join(root, f"{i}.wav")
            write_wav(p, (rng.randn(n) * 0.05).astype(np.float32), SR)
            f.write(json.dumps(
                {"audio_filepath": p, "duration": 0.5, "text": text}) + "\n")
    return mpath


def _dataset(manifest):
    from conformer_nemo_tpu.data.dataset import BucketedAudioTextDataset
    from conformer_nemo_tpu.data.manifest import read_manifest
    from conformer_nemo_tpu.data.tokenizers import CharTokenizer

    tok = CharTokenizer([" ", "a", "b"])
    return BucketedAudioTextDataset(read_manifest(manifest), tok, n_buckets=1)


def load_local_batch(manifest: str, process_index: int, process_count: int):
    """This process's shard as a batch dict (deterministic, shuffle off)."""
    from conformer_nemo_tpu.data.dataset import BucketedLoader

    loader = BucketedLoader(
        _dataset(manifest), LOCAL_BATCH, shuffle=False, drop_last=True,
        process_index=process_index, process_count=process_count,
    )
    b = next(iter(loader))
    return {"audio": b.audio, "audio_lens": b.audio_lens,
            "tokens": b.tokens, "token_lens": b.token_lens}


def make_tiny_setup(mesh):
    """(replicated TrainState, sharded step fn) for a tiny CTC model."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from conformer_nemo_tpu.models.conformer import ConformerEncoderConfig
    from conformer_nemo_tpu.models.ctc_model import CTCModelConfig
    from conformer_nemo_tpu.audio.features import MelFeatureConfig
    from conformer_nemo_tpu.train.lr_schedule import make_lr_schedule
    from conformer_nemo_tpu.train.optim import make_optimizer
    from conformer_nemo_tpu.train.trainer import init_ctc_state, make_ctc_train_step

    enc = ConformerEncoderConfig(
        feat_in=FEAT, n_layers=1, d_model=16, n_heads=2, dtype=jnp.float32,
        dropout=0.0, dropout_att=0.0,
    )
    cfg = CTCModelConfig(
        preprocessor=MelFeatureConfig(features=FEAT, dither=0.0),
        encoder=enc, num_classes=3,
    )
    sched = make_lr_schedule({"name": "CosineAnnealing", "warmup_steps": 1,
                              "max_steps": 10}, 1e-3)
    opt = make_optimizer("adamw", sched)
    # init INSIDE jit with replicated out-sharding so every process holds the
    # same global (fully-replicated) state arrays
    rep = NamedSharding(mesh, P())
    state = jax.jit(
        lambda key: init_ctc_state(cfg, opt, key, (1, FEAT, 16)),
        out_shardings=rep,
    )(jax.random.PRNGKey(0))
    # state_template arms tensor-parallel in/out shardings when the mesh has
    # a 'model' axis > 1 (no effect on the pure-dp mesh)
    step = make_ctc_train_step(cfg, opt, mesh=mesh, state_template=state)
    return state, step
