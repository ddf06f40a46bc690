#!/usr/bin/env python
"""Train a BPE tokenizer from manifest transcripts.

Parity target: the reference's (stripped) process_asr_text_tokenizer.py
referenced at configs/conformer_ctc_bpe.yaml:75.

Usage:
    python scripts/train_tokenizer.py --manifest train.json --vocab-size 128 \
        --out tokenizer_dir/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--vocab-size", type=int, default=128)
    ap.add_argument("--out", required=True)
    ap.add_argument("--no-lowercase", action="store_true")
    args = ap.parse_args()

    from conformer_nemo_tpu.data.manifest import read_manifest
    from conformer_nemo_tpu.data.tokenizers import train_bpe_tokenizer

    texts = [s.text for s in read_manifest(args.manifest)]
    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out, "tokenizer.json")
    tok = train_bpe_tokenizer(
        texts, vocab_size=args.vocab_size, out_path=out_path,
        lowercase=not args.no_lowercase,
    )
    print(f"trained {tok.vocab_size}-piece tokenizer -> {out_path}")


if __name__ == "__main__":
    main()
