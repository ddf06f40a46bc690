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
    ap.add_argument("--timestamps", action="store_true",
                    help="emit word timestamps; with --ctm-dir, "
                         "write one .ctm per file")
    ap.add_argument("--ctm-dir", default=None)
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

    word_ts = None
    if args.timestamps:
        word_ts = model.transcribe_with_timestamps(
            paths, batch_size=args.batch_size)
        for p, words in zip(paths, word_ts):
            for w in words:
                print(f"  {w.start_s:7.2f} {w.start_s + w.duration_s:7.2f}  "
                      f"{w.word}")
        if args.ctm_dir:
            import os

            os.makedirs(args.ctm_dir, exist_ok=True)
            for p, words in zip(paths, word_ts):
                uniq = os.path.splitext(os.path.basename(p))[0]
                out = os.path.join(args.ctm_dir, uniq + ".ctm")
                with open(out, "w") as f:
                    for w in words:
                        f.write(f"{uniq} 1 {w.start_s:.3f} "
                                f"{w.duration_s:.3f} {w.word} "
                                f"{w.probability:1.3f}\n")
                print(f"wrote {out}")

    if args.output:
        with open(args.output, "w") as f:
            for i, (p, h) in enumerate(zip(paths, hyps)):
                row = {"audio_filepath": p, "pred_text": h}
                if word_ts is not None:
                    row["words"] = [
                        {"word": w.word, "start": round(w.start_s, 3),
                         "end": round(w.start_s + w.duration_s, 3)}
                        for w in word_ts[i]]
                f.write(json.dumps(row) + "\n")
    if args.wer and refs:
        print(f"WER: {word_error_rate(hyps[-len(refs):], refs):.4f}")


if __name__ == "__main__":
    main()
