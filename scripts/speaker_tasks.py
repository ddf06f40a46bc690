#!/usr/bin/env python
"""Speaker recognition / verification / diarization entry point.

Parity target: the reference's speaker-task scripts
(`examples/speaker_tasks/recognition/speaker_reco.py` and
`.../diarization/offline_diarization.py`, stripped from the fork;
reconstructed from `label_models.py` + `clustering_diarizer.py`).

Usage:
    # train a speaker model
    python scripts/speaker_tasks.py train --train-manifest spk.json \
        --max-steps 5000 --out spk.cntpu
    # verify two files are the same speaker
    python scripts/speaker_tasks.py verify --model spk.cntpu a.wav b.wav
    # diarize a session (RTTM to stdout or --rttm-out)
    python scripts/speaker_tasks.py diarize --model spk.cntpu session.wav \
        [--num-speakers 2] [--rttm-out out.rttm]
"""

import argparse
import sys

from common import parse_overrides  # noqa: F401  (sys.path side effect)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["train", "verify", "diarize", "embed", "score"])
    ap.add_argument("audio", nargs="*", default=[])
    ap.add_argument("--model")
    ap.add_argument("--train-manifest")
    ap.add_argument("--val-manifest")
    ap.add_argument("--labels", nargs="*", default=None)
    ap.add_argument("--max-steps", type=int, default=2000)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--fixed-seconds", type=float, default=3.0)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--features", type=int, default=80)
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--num-speakers", type=int, default=None)
    ap.add_argument("--window", type=float, default=1.5)
    ap.add_argument("--shift", type=float, default=0.75)
    ap.add_argument("--rttm-out", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--ref-rttm", nargs="*", default=[],
                    help="score mode: reference RTTMs (paired with --hyp-rttm)")
    ap.add_argument("--hyp-rttm", nargs="*", default=[])
    ap.add_argument("--collar", type=float, default=0.25)
    ap.add_argument("--ignore-overlap", action="store_true", default=True)
    args = ap.parse_args()

    if args.mode == "train" and not args.train_manifest:
        ap.error("train mode requires --train-manifest")
    if args.mode not in ("train", "score") and not args.model:
        ap.error(f"{args.mode} mode requires --model")

    if args.mode == "score":
        # cumulative DER over (ref, hyp) RTTM pairs (speaker_utils.score_labels)
        import json

        from conformer_nemo_tpu.decode.der import score_rttm_files

        if len(args.ref_rttm) != len(args.hyp_rttm) or not args.ref_rttm:
            raise SystemExit("score mode needs matching --ref-rttm/--hyp-rttm lists")
        res = score_rttm_files(list(zip(args.ref_rttm, args.hyp_rttm)),
                               collar=args.collar,
                               ignore_overlap=args.ignore_overlap)
        print(json.dumps({k: round(v, 4) for k, v in res.items()}))
        return 0

    from conformer_nemo_tpu.api_label import SpeakerLabelModel
    from conformer_nemo_tpu.audio.features import MelFeatureConfig

    if args.mode == "train":
        labels = args.labels
        if not labels:
            from conformer_nemo_tpu.data.audio_to_label import (
                extract_labels, read_label_manifest)

            labels = extract_labels(read_label_manifest(args.train_manifest))
            print(f"extracted {len(labels)} speakers")
        model = SpeakerLabelModel(
            labels=labels, mel=MelFeatureConfig(features=args.features))
        result = model.fit(
            args.train_manifest, args.val_manifest,
            max_steps=args.max_steps, batch_size=args.batch_size,
            fixed_seconds=args.fixed_seconds, lr=args.lr)
        print(f"trained {result['steps']} steps; "
              f"last={result['history'][-1] if result['history'] else None}")
        if "val" in result:
            print(f"val: {result['val']}")
        if args.out:
            model.save_portable(args.out)
            print(f"portable: {args.out}")
        return 0

    model = SpeakerLabelModel.restore_portable(args.model)
    if args.mode == "verify":
        a, b = args.audio[:2]
        same = model.verify_speakers(a, b, threshold=args.threshold)
        print("same speaker" if same else "different speakers")
        return 0
    if args.mode == "embed":
        import numpy as np

        for path in args.audio:
            emb = model.get_embedding(path)
            print(path, " ".join(f"{x:.5f}" for x in np.asarray(emb)))
        return 0
    # diarize
    from conformer_nemo_tpu.decode.diarization import ClusteringDiarizer, to_rttm

    diar = ClusteringDiarizer(model, window=args.window, shift=args.shift)
    for path in args.audio:
        turns = diar.diarize(path, oracle_num_speakers=args.num_speakers)
        rttm = to_rttm(turns, path.rsplit("/", 1)[-1].rsplit(".", 1)[0])
        if args.rttm_out:
            with open(args.rttm_out, "a") as f:
                f.write(rttm)
            print(f"wrote {len(turns)} turns -> {args.rttm_out}")
        else:
            print(rttm, end="")
    return 0


if __name__ == "__main__":
    sys.exit(main())
