"""Long-form exact decode throughput (transcribe longform path, on-chip).

Measures the eval forward the round-5 `transcribe(longform_threshold_s=...)`
path runs for one long utterance: mel frontend -> flagship 18L d512 bf16
Conformer encoder with a (128,128) att_context band (streaming-consistent
long-form config) -> CTC greedy argmax, B=1, whole utterance, no chunk
merge. Reports audio-s/s at T_enc = 6144 (~4.1 min) and 12288 (~8.2 min;
banded flash full-T vs streamed picked by the VMEM-estimate dispatch).

Run detached (CLAUDE.md): python scripts/bench_longform_decode.py > /tmp/blf.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
import jax.numpy as jnp
import numpy as np

from conformer_nemo_tpu.audio.features import MelFeatureConfig, log_mel_spectrogram
from conformer_nemo_tpu.audio.spec_augment import SpecAugmentConfig
from conformer_nemo_tpu.models.conformer import ConformerEncoderConfig
from conformer_nemo_tpu.models.ctc_model import CTCModel, CTCModelConfig

SR = 16000


def main():
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    for t_enc in (6144, 12288):
        enc = ConformerEncoderConfig(
            feat_in=80, n_layers=18, d_model=512, n_heads=8,
            conv_norm_type="batch_norm", dtype=jnp.bfloat16,
            att_context_size=(128, 128), dropout=0.0, dropout_att=0.0,
        )
        cfg = CTCModelConfig(
            preprocessor=MelFeatureConfig(dither=0.0),
            spec_augment=SpecAugmentConfig(freq_masks=0, time_masks=0),
            encoder=enc, num_classes=128,
        )
        model = CTCModel(cfg)
        t_mel = t_enc * 4
        t_samples = t_mel * 160  # hop 10 ms
        audio_s = t_samples / SR
        rng = np.random.RandomState(0)
        audio = jnp.asarray((rng.randn(1, t_samples) * 0.1), jnp.float32)
        lens = jnp.full((1,), t_samples, jnp.int32)
        feats, fl = log_mel_spectrogram(cfg.preprocessor, audio, lens,
                                        training=False)
        variables = model.init(jax.random.PRNGKey(0), feats[:, :, :256],
                               jnp.full((1,), 256, jnp.int32), train=False)

        @jax.jit
        def decode(variables, audio, lens):
            feats, fl = log_mel_spectrogram(cfg.preprocessor, audio, lens,
                                            training=False)
            log_probs, enc_lens = model.apply(variables, feats, fl,
                                              train=False)
            return jnp.argmax(log_probs, -1), enc_lens

        for _ in range(2):
            ids, el = decode(variables, audio, lens)
        _ = int(np.asarray(el)[0])
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            ids, el = decode(variables, audio, lens)
        _ = float(jnp.sum(ids))
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "t_enc": t_enc, "audio_s": round(audio_s, 1),
            "decode_ms": round(dt * 1e3, 1),
            "audio_s_per_s": round(audio_s / dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
