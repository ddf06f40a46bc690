"""RNN-T joint+loss variant sweep on the real chip (round-5 floor audit).

Measures the large train step at several (batch, fused_batch_size) points to
attribute the ~20 ms joint+loss segment (see docs/PERFORMANCE.md RNN-T
table): chunked lax.map vs whole-batch joint, B=8 vs B=16.
Usage: python scripts/bench_rnnt_variants.py [variant ...]
where variant = "B,fused" e.g. 8,4 8,0 8,8 16,8 16,4 (default sweep).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import jax.numpy as jnp

from conformer_nemo_tpu.models.conformer import ConformerEncoderConfig
from conformer_nemo_tpu.models.rnnt import (RNNTDecoderConfig, RNNTJointConfig,
                                            RNNTModelConfig)
from conformer_nemo_tpu.train.lr_schedule import make_lr_schedule
from conformer_nemo_tpu.train.optim import make_optimizer
from conformer_nemo_tpu.train.rnnt_trainer import (RNNTTrainConfig,
                                                   init_rnnt_state,
                                                   make_rnnt_train_step)

SECONDS, SR, U = 15.0, 16000, 96


def run(b, fused, joint_impl="dense", bt=32):
    enc = ConformerEncoderConfig(feat_in=80, n_layers=17, d_model=512,
                                 n_heads=8, conv_norm_type="batch_norm",
                                 dtype=jnp.bfloat16)
    mcfg = RNNTModelConfig(
        encoder=enc,
        decoder=RNNTDecoderConfig(vocab_size=1024, pred_hidden=640,
                                  pred_rnn_layers=1),
        joint=RNNTJointConfig(joint_hidden=640, fused_batch_size=fused,
                              fuse_loss_wer=fused > 0),
        joint_impl=joint_impl, joint_flash_bt=bt,
    )
    cfg = RNNTTrainConfig(model=mcfg)
    sched = make_lr_schedule(
        {"name": "NoamAnnealing", "d_model": 512, "warmup_steps": 10000}, 2.0)
    opt = make_optimizer("adamw", sched, weight_decay=1e-3, grad_clip=1.0)
    state = init_rnnt_state(cfg, opt, jax.random.PRNGKey(0))
    step = make_rnnt_train_step(cfg, opt)
    t_samples = int(SECONDS * SR)
    rng = np.random.RandomState(0)
    batch = jax.tree.map(jnp.asarray, {
        "audio": (rng.randn(b, t_samples) * 0.1).astype(np.float32),
        "audio_lens": np.full((b,), t_samples, np.int32),
        "tokens": rng.randint(0, 1024, size=(b, U)).astype(np.int32),
        "token_lens": np.full((b,), U, np.int32),
    })
    for _ in range(3):
        state, metrics = step(state, batch)
    loss0 = float(metrics["loss"])
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"B={b} fused={fused} joint={joint_impl}(bt={bt}): "
          f"step {dt * 1e3:.2f} ms  "
          f"{b * SECONDS / dt:.1f} audio_s/s  (loss {loss0:.3f})", flush=True)


def main():
    variants = sys.argv[1:] or ["8,4", "8,0", "16,8", "16,0"]
    for v in variants:
        parts = v.split(",")
        b, fused = int(parts[0]), int(parts[1])
        joint_impl = parts[2] if len(parts) > 2 else "dense"
        bt = int(parts[3]) if len(parts) > 3 else 32
        run(b, fused, joint_impl, bt)


if __name__ == "__main__":
    main()
