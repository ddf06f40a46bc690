"""Long-form RNN-T training demonstration: flash joint + flash attention.

The dense whole-batch joint needs O(B*T*U*V) HBM — at 120 s utterances
(T=3008 frames, U=384 tokens) that is ~28 GB for B=4, beyond any single
chip, and the reference's only lever (fused_batch_size chunking,
modules/rnnt.py:839) still materializes one chunk's [b,T,U,V]. The flash
joint (ops/pallas/rnnt_joint_kernel.py) streams O(bt*U1*V) tiles through
VMEM, so transducer training scales in T and U like the CTC long-form path.

Usage: python scripts/bench_rnnt_longform.py [B,secs,U,bt ...]
default: 2,120,384,8 4,120,384,8
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

SR = 16000


def run(b, secs, u, bt, band_l=-1, band_r=-1):
    # long-form encoder policy (configs/conformer_ctc_bpe_longform.yaml):
    # dropout_att=0 keeps the flash-attention kernel engaged in training;
    # remat bounds per-layer residuals at these T
    enc = ConformerEncoderConfig(feat_in=80, n_layers=17, d_model=512,
                                 n_heads=8, conv_norm_type="batch_norm",
                                 dropout_att=0.0, remat=True,
                                 att_context_size=(band_l, band_r),
                                 dtype=jnp.bfloat16)
    mcfg = RNNTModelConfig(
        encoder=enc,
        decoder=RNNTDecoderConfig(vocab_size=1024, pred_hidden=640,
                                  pred_rnn_layers=1),
        joint=RNNTJointConfig(joint_hidden=640, fused_batch_size=0,
                              fuse_loss_wer=False),
        joint_impl="flash", joint_flash_bt=bt,
    )
    cfg = RNNTTrainConfig(model=mcfg)
    sched = make_lr_schedule(
        {"name": "NoamAnnealing", "d_model": 512, "warmup_steps": 10000}, 2.0)
    opt = make_optimizer("adamw", sched, weight_decay=1e-3, grad_clip=1.0)
    state = init_rnnt_state(cfg, opt, jax.random.PRNGKey(0))
    step = make_rnnt_train_step(cfg, opt)
    t_samples = int(secs * SR)
    dense_gb = 3 * 2 * b * (t_samples // (160 * 4) + 1) * (u + 1) * 1025 / 1e9
    rng = np.random.RandomState(0)
    batch = jax.tree.map(jnp.asarray, {
        "audio": (rng.randn(b, t_samples) * 0.1).astype(np.float32),
        "audio_lens": np.full((b,), t_samples, np.int32),
        "tokens": rng.randint(0, 1024, size=(b, u)).astype(np.int32),
        "token_lens": np.full((b,), u, np.int32),
    })
    for _ in range(2):
        state, metrics = step(state, batch)
    loss0 = float(metrics["loss"])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    mem = jax.local_devices()[0].memory_stats() or {}
    peak = mem.get("peak_bytes_in_use", 0) / 2 ** 30
    band = f" band=({band_l},{band_r})" if band_l >= 0 or band_r >= 0 else ""
    print(f"B={b} {secs:.0f}s U={u} bt={bt}{band}: step {dt * 1e3:.1f} ms  "
          f"{b * secs / dt:.1f} audio_s/s  peak {peak:.1f} GiB  "
          f"(dense joint transients would be ~{dense_gb:.0f} GB)  "
          f"loss {loss0:.1f}", flush=True)


def main():
    variants = sys.argv[1:] or ["2,120,384,8", "4,120,384,8"]
    for v in variants:
        parts = [int(x) for x in v.split(",")]
        run(*parts)


if __name__ == "__main__":
    main()
