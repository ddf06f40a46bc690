#!/usr/bin/env python
"""Offline transcription from a portable model archive.

Usage (reference transcribe_speech.py parity, Jenkinsfile:567-588):
    python scripts/transcribe_speech.py --model model.cntpu \
        --audio a.wav b.wav [--manifest test.json --wer]
"""

import argparse
import json
import sys

from common import parse_overrides


def main():
    _, leftover = parse_overrides(sys.argv[1:])
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help=".cntpu portable archive")
    ap.add_argument("--model-type", choices=["ctc", "rnnt"], default="ctc")
    ap.add_argument("--audio", nargs="*", default=[])
    ap.add_argument("--manifest", default=None)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--wer", action="store_true")
    ap.add_argument("--output", default=None, help="write hypotheses JSONL")
    args = ap.parse_args(leftover)

    from conformer_nemo_tpu.api import ConformerCTC, ConformerTransducer
    from conformer_nemo_tpu.data.manifest import read_manifest
    from conformer_nemo_tpu.decode.wer import word_error_rate

    cls = ConformerCTC if args.model_type == "ctc" else ConformerTransducer
    model = cls.restore_portable(args.model)

    paths, refs = list(args.audio), []
    if args.manifest:
        for s in read_manifest(args.manifest):
            paths.append(s.audio_file)
            refs.append(s.text)

    hyps = model.transcribe(paths, batch_size=args.batch_size)
    for p, h in zip(paths, hyps):
        print(f"{p}\t{h}")
    if args.output:
        with open(args.output, "w") as f:
            for p, h in zip(paths, hyps):
                f.write(json.dumps({"audio_filepath": p, "pred_text": h}) + "\n")
    if args.wer and refs:
        print(f"WER: {word_error_rate(hyps[-len(refs):], refs):.4f}")


if __name__ == "__main__":
    main()
