#!/usr/bin/env python
"""Self-supervised Conformer pretraining (masked contrastive).

Parity target: the reference's SSL entry point
(`examples/asr/speech_pretraining/speech_pre_training.py`, stripped from the
fork; reconstructed from `ssl_models.py` + the Jenkinsfile SSL stage).

Usage:
    python scripts/ssl_pretrain.py --config configs/conformer_ctc_bpe.yaml \
        model.train_ds.manifest_filepath=unlabeled.json \
        trainer.max_steps=100000 --out ssl.cntpu
"""

import argparse
import sys

from common import parse_overrides


def main():
    overrides, leftover = parse_overrides(sys.argv[1:])
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/conformer_ctc_bpe.yaml",
                    help="encoder/preprocessor come from this ASR config")
    ap.add_argument("--out", default="ssl_pretrained.cntpu")
    ap.add_argument("--quantized-targets", action="store_true")
    ap.add_argument("--patch-size", type=int, default=48)
    ap.add_argument("--mask-patches", type=int, default=10)
    args = ap.parse_args(leftover)

    import jax.numpy as jnp

    from conformer_nemo_tpu.api_ssl import SpeechSSLModel
    from conformer_nemo_tpu.config.loader import (
        build_encoder_config,
        build_preprocessor_config,
        load_config,
    )
    from conformer_nemo_tpu.ops.contrastive_loss import ContrastiveLossConfig

    cfg = load_config(args.config, overrides)
    m = cfg["model"]
    mel = build_preprocessor_config(m.get("preprocessor", {}))
    enc = build_encoder_config(m.get("encoder", {}), dtype=jnp.bfloat16)
    tr = cfg.get("trainer", {})

    model = SpeechSSLModel(
        encoder=enc, mel=mel,
        loss=ContrastiveLossConfig(
            in_dim=mel.features,
            combine_time_steps=enc.subsampling_factor,
            quantized_targets=args.quantized_targets),
        patch_size=args.patch_size, mask_patches=args.mask_patches)
    result = model.fit(
        m["train_ds"]["manifest_filepath"],
        max_steps=int(tr.get("max_steps") or 1000),
        batch_size=int(m["train_ds"].get("batch_size", 8)),
        lr=float(m.get("optim", {}).get("lr", 1e-3))
        if isinstance(m.get("optim", {}).get("lr", 1e-3), (int, float)) else 1e-3,
        log_every_n_steps=int(tr.get("log_every_n_steps", 20)))
    print(f"pretrained {result['steps']} steps; "
          f"last={result['history'][-1] if result['history'] else None}")
    model.save_portable(args.out)
    print(f"portable: {args.out}")


if __name__ == "__main__":
    sys.exit(main())
