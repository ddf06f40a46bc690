"""RNN-T large train throughput on the real chip (mirrors bench.py)."""
import json, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import jax.numpy as jnp

from conformer_nemo_tpu.audio.features import MelFeatureConfig
from conformer_nemo_tpu.audio.spec_augment import SpecAugmentConfig
from conformer_nemo_tpu.models.conformer import ConformerEncoderConfig
from conformer_nemo_tpu.models.rnnt import RNNTModelConfig, RNNTDecoderConfig, RNNTJointConfig
from conformer_nemo_tpu.train.lr_schedule import make_lr_schedule
from conformer_nemo_tpu.train.optim import make_optimizer
from conformer_nemo_tpu.train.rnnt_trainer import RNNTTrainConfig, init_rnnt_state, make_rnnt_train_step

B, SECONDS, SR, U = 8, 15.0, 16000, 96
enc = ConformerEncoderConfig(feat_in=80, n_layers=17, d_model=512, n_heads=8,
                             conv_norm_type="batch_norm", dtype=jnp.bfloat16)
mcfg = RNNTModelConfig(
    encoder=enc,
    decoder=RNNTDecoderConfig(vocab_size=1024, pred_hidden=640, pred_rnn_layers=1),
    joint=RNNTJointConfig(joint_hidden=640, fused_batch_size=4),
)
cfg = RNNTTrainConfig(model=mcfg)
sched = make_lr_schedule({"name": "NoamAnnealing", "d_model": 512, "warmup_steps": 10000}, 2.0)
opt = make_optimizer("adamw", sched, weight_decay=1e-3, grad_clip=1.0)
state = init_rnnt_state(cfg, opt, jax.random.PRNGKey(0))
step = make_rnnt_train_step(cfg, opt)

t_samples = int(SECONDS * SR)
rng = np.random.RandomState(0)
batch = jax.tree.map(jnp.asarray, {
    "audio": (rng.randn(B, t_samples) * 0.1).astype(np.float32),
    "audio_lens": np.full((B,), t_samples, np.int32),
    "tokens": rng.randint(0, 1024, size=(B, U)).astype(np.int32),
    "token_lens": np.full((B,), U, np.int32),
})
for _ in range(3):
    state, metrics = step(state, batch)
float(metrics["loss"])
t0 = time.perf_counter()
ITERS = 20
for _ in range(ITERS):
    state, metrics = step(state, batch)
float(metrics["loss"])
dt = time.perf_counter() - t0
print(json.dumps({"metric": "rnnt_large_train_throughput",
                  "value": round(B * SECONDS * ITERS / dt, 2),
                  "unit": "audio_s/s/chip", "step_ms": round(dt / ITERS * 1e3, 2)}))
