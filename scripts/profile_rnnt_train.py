"""Capture a jax.profiler trace of the RNN-T-large train step on the TPU.

Usage: python scripts/profile_rnnt_train.py [outdir] [batch]
Writes a trace to outdir (default /tmp/jaxtrace_rnnt) and prints step
timing. Same model/shape as bench.py bench_rnnt_train (17L d512 bf16
encoder, pred/joint 640, V=1024, fused_batch_size=4, B=8 x 15 s; pass a
batch arg for the B=16 variant). Pairs with scripts/parse_profile.py —
the per-segment floor table lives in docs/PERFORMANCE.md (VERDICT r4 #2).
"""

import os
import sys
import time

import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace_rnnt"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    fused = int(os.environ.get("RNNT_FUSED", "-1"))
    if fused < 0:
        cfg, state, step = bench._rnnt_setup(jax, jnp)
    else:
        from conformer_nemo_tpu.models.conformer import ConformerEncoderConfig
        from conformer_nemo_tpu.models.rnnt import (
            RNNTDecoderConfig, RNNTJointConfig, RNNTModelConfig)
        from conformer_nemo_tpu.train.lr_schedule import make_lr_schedule
        from conformer_nemo_tpu.train.optim import make_optimizer
        from conformer_nemo_tpu.train.rnnt_trainer import (
            RNNTTrainConfig, init_rnnt_state, make_rnnt_train_step)
        enc = ConformerEncoderConfig(feat_in=80, n_layers=17, d_model=512,
                                     n_heads=8, conv_norm_type="batch_norm",
                                     dtype=jnp.bfloat16)
        mcfg = RNNTModelConfig(
            encoder=enc,
            decoder=RNNTDecoderConfig(vocab_size=1024, pred_hidden=640,
                                      pred_rnn_layers=1),
            joint=RNNTJointConfig(joint_hidden=640, fused_batch_size=fused,
                                  fuse_loss_wer=fused > 0),
        )
        cfg = RNNTTrainConfig(model=mcfg)
        sched = make_lr_schedule({"name": "NoamAnnealing", "d_model": 512,
                                  "warmup_steps": 10000}, 2.0)
        opt = make_optimizer("adamw", sched, weight_decay=1e-3, grad_clip=1.0)
        state = init_rnnt_state(cfg, opt, jax.random.PRNGKey(0))
        step = make_rnnt_train_step(cfg, opt)

    u = 96
    t_samples = int(bench.SECONDS * bench.SR)
    rng = np.random.RandomState(0)
    batch = jax.tree.map(jnp.asarray, {
        "audio": (rng.randn(b, t_samples) * 0.1).astype(np.float32),
        "audio_lens": np.full((b,), t_samples, np.int32),
        "tokens": rng.randint(0, 1024, size=(b, u)).astype(np.int32),
        "token_lens": np.full((b,), u, np.int32),
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
    print(f"B={b} step {dt * 1e3:.2f} ms  ({b * bench.SECONDS / dt:.1f} audio_s/s)")
    print(f"trace in {outdir}")


if __name__ == "__main__":
    main()
