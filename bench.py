"""Benchmark: Conformer-CTC large training throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: audio-seconds of speech processed per wall-clock second per chip in
training (fwd+bwd+optimizer, bf16 compute). Baseline reference point: the
reference stack (NeMo 1.8 Conformer-CTC large, A100 DDP) sustains roughly
400 audio-s/s/GPU — the repo publishes no numbers (BASELINE.md), so this
external estimate anchors vs_baseline.
"""

import json
import time

import numpy as np

BASELINE_AUDIO_S_PER_S = 400.0

BATCH = 16
SECONDS = 15.0  # per-utterance duration
SR = 16000
WARMUP = 3
ITERS = 20


def main():
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from conformer_nemo_tpu.train.lr_schedule import make_lr_schedule
    from conformer_nemo_tpu.train.optim import make_optimizer
    from conformer_nemo_tpu.train.trainer import init_ctc_state, make_ctc_train_step

    cfg = _flagship_cfg()
    sched = make_lr_schedule(
        {"name": "NoamAnnealing", "d_model": cfg.encoder.d_model, "warmup_steps": 10000}, 2.0
    )
    opt = make_optimizer("adamw", sched, weight_decay=1e-3, grad_clip=1.0)
    state = init_ctc_state(cfg, opt, jax.random.PRNGKey(0), example_feat_shape=(1, 80, 128))

    step = make_ctc_train_step(cfg, opt)
    t_samples = int(SECONDS * SR)
    rng = np.random.RandomState(0)
    # device-resident batch: in training the loader prefetches batches to the
    # device asynchronously (data/prefetch.py), so steady-state step time does
    # not include the H2D copy.
    batch = jax.tree.map(jnp.asarray, {
        "audio": (rng.randn(BATCH, t_samples) * 0.1).astype(np.float32),
        "audio_lens": np.full((BATCH,), t_samples, np.int32),
        "tokens": rng.randint(0, cfg.num_classes, size=(BATCH, 128)).astype(np.int32),
        "token_lens": np.full((BATCH,), 128, np.int32),
    })

    for _ in range(WARMUP):
        state, metrics = step(state, batch)
    float(metrics["loss"])  # value fetch: block_until_ready does not truly
    # synchronize through the axon tunnel; fetching a scalar does.

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, batch)
    float(metrics["loss"])  # forces the whole dependency chain
    dt = time.perf_counter() - t0

    audio_s_per_s = BATCH * SECONDS * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "ctc_large_train_throughput",
                "value": round(audio_s_per_s, 2),
                "unit": "audio_s/s/chip",
                "vs_baseline": round(audio_s_per_s / BASELINE_AUDIO_S_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
