"""Capture a jax.profiler trace of the CTC-large train step on the TPU.

Usage: python scripts/profile_train.py [outdir]
Writes a trace to outdir (default /tmp/jaxtrace) and prints step timing.
"""

import os
import sys
import time

import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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

    B, t_samples = 16, 15 * 16000
    rng = np.random.RandomState(0)
    batch = jax.tree.map(jnp.asarray, {
        "audio": (rng.randn(B, t_samples) * 0.1).astype(np.float32),
        "audio_lens": np.full((B,), t_samples, np.int32),
        "tokens": rng.randint(0, cfg.num_classes, size=(B, 128)).astype(np.int32),
        "token_lens": np.full((B,), 128, np.int32),
    })

    for _ in range(3):
        state, metrics = step(state, batch)
    float(metrics["loss"])

    with jax.profiler.trace(outdir):
        for _ in range(5):
            state, metrics = step(state, batch)
        float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(20):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / 20
    print(f"step: {dt*1e3:.2f} ms; trace in {outdir}")


if __name__ == "__main__":
    main()
