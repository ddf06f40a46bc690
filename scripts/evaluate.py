#!/usr/bin/env python
"""Compute WER/CER of a portable model on a manifest.

Usage:
    python scripts/evaluate.py --model model.cntpu --manifest test.json [--cer]
"""

import argparse
import sys

from common import parse_overrides


def main():
    _, leftover = parse_overrides(sys.argv[1:])
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--model-type", choices=["ctc", "rnnt"], default="ctc")
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--cer", action="store_true")
    ap.add_argument("--decoding-strategy", default=None,
                    help="rnnt: greedy_batch | beam_batch | beam | tsd | alsd | maes; "
                         "ctc: greedy | beamsearch_ngram")
    ap.add_argument("--beam-size", type=int, default=4)
    ap.add_argument("--lm-path", default=None,
                    help="n-gram LM for ctc beamsearch_ngram: ARPA text, or "
                         "a probing or trie-family KenLM .bin with "
                         "--kenlm-bin")
    ap.add_argument("--beam-alpha", type=float, default=1.0)
    ap.add_argument("--beam-beta", type=float, default=1.5)
    ap.add_argument("--kenlm-bin", "--kenlm-probing", dest="kenlm_bin",
                    action="store_true",
                    help="read probing and trie-family (incl. -a array) KenLM "
                         ".bin LMs "
                         "directly (see decode/ctc_beam.py "
                         "BeamSearchDecoderWithLM)")
    args = ap.parse_args(leftover)

    from conformer_nemo_tpu.api import ConformerCTC, ConformerTransducer
    from conformer_nemo_tpu.data.manifest import read_manifest
    from conformer_nemo_tpu.decode.wer import word_error_rate

    cls = ConformerCTC if args.model_type == "ctc" else ConformerTransducer
    model = cls.restore_portable(args.model)
    if args.decoding_strategy:
        if args.model_type == "rnnt":
            model.change_decoding_strategy({
                "strategy": args.decoding_strategy,
                "greedy": {"max_symbols": 10},
                "beam": {"beam_size": args.beam_size, "tsd_max_sym_exp": 2},
            })
        else:
            model.change_decoding_strategy({
                "strategy": args.decoding_strategy,
                "beam": {"beam_width": args.beam_size, "alpha": args.beam_alpha,
                         "beta": args.beam_beta, "lm_path": args.lm_path,
                         "kenlm_bin": args.kenlm_bin},
            })
    samples = read_manifest(args.manifest)
    hyps = model.transcribe([s.audio_file for s in samples], batch_size=args.batch_size)
    refs = [s.text for s in samples]
    metric = word_error_rate(hyps, refs, use_cer=args.cer)
    print(f"{'CER' if args.cer else 'WER'}: {metric:.4f}  ({len(samples)} utts)")


if __name__ == "__main__":
    main()
