#!/usr/bin/env python
"""Train/evaluate a speech-command classification (or VAD) model.

Parity target: the reference's speech-classification entry point
(`examples/asr/speech_classification/speech_to_label.py`, stripped from the
fork; reconstructed from `classification_models.py` + Jenkinsfile stages).

Usage:
    python scripts/speech_classification.py \
        --train-manifest train.json --val-manifest val.json \
        --labels yes no up down --max-steps 2000 --out model.cntpu
    python scripts/speech_classification.py --model model.cntpu \
        --predict a.wav b.wav
"""

import argparse
import sys

from common import parse_overrides  # noqa: F401  (sys.path side effect)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-manifest")
    ap.add_argument("--val-manifest")
    ap.add_argument("--labels", nargs="*", default=None,
                    help="label set; default: extracted from the train manifest")
    ap.add_argument("--model", help="restore a portable .cntpu instead of training")
    ap.add_argument("--predict", nargs="*", default=None, help="audio files to classify")
    ap.add_argument("--max-steps", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--fixed-seconds", type=float, default=4.0)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if not args.model and not args.train_manifest:
        ap.error("provide --train-manifest (to train) or --model (to restore)")

    from conformer_nemo_tpu.api_label import ClassificationModel
    from conformer_nemo_tpu.audio.features import MelFeatureConfig

    if args.model:
        model = ClassificationModel.restore_portable(args.model)
    else:
        labels = args.labels
        if not labels:
            from conformer_nemo_tpu.data.audio_to_label import (
                extract_labels, read_label_manifest)

            labels = extract_labels(read_label_manifest(args.train_manifest))
            print(f"extracted {len(labels)} labels: {labels}")
        model = ClassificationModel(
            labels=labels, mel=MelFeatureConfig(features=args.features))
        result = model.fit(
            args.train_manifest, args.val_manifest,
            max_steps=args.max_steps, batch_size=args.batch_size,
            fixed_seconds=args.fixed_seconds, lr=args.lr, augment=True)
        print(f"trained: {result['steps']} steps, "
              f"last={result['history'][-1] if result['history'] else None}")
        if "val" in result:
            print(f"val: {result['val']}")
        if args.out:
            model.save_portable(args.out)
            print(f"portable: {args.out}")

    if args.predict:
        preds = model.predict(args.predict, fixed_seconds=args.fixed_seconds)
        for path, label in zip(args.predict, preds):
            print(f"{path}\t{label}")


if __name__ == "__main__":
    sys.exit(main())
