#!/usr/bin/env python
"""Train a Conformer-Transducer model (char or BPE vocab).

Usage:
    python scripts/speech_to_text_rnnt.py --config configs/conformer_transducer_bpe.yaml \
        model.train_ds.manifest_filepath=/data/train.json \
        model.validation_ds.manifest_filepath=/data/val.json [+fast_dev_run=true]
"""

import argparse
import sys

from common import build_exp_manager, parse_overrides


def main():
    overrides, leftover = parse_overrides(sys.argv[1:])
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/conformer_transducer_bpe.yaml")
    ap.add_argument("--tokenizer-dir", default=None)
    args = ap.parse_args(leftover)

    fast_dev_run = bool(overrides.pop("fast_dev_run", False))

    from conformer_nemo_tpu.api import ConformerTransducer

    model = ConformerTransducer.from_config_file(
        args.config, tokenizer_dir=args.tokenizer_dir, overrides=overrides
    )
    em = None if fast_dev_run else build_exp_manager(model.raw_cfg)
    result = model.fit(
        max_steps=1 if fast_dev_run else None,
        max_epochs=1 if fast_dev_run else None,
        exp_manager=em,
    )
    print(f"done: {result}")
    if em is not None and em.cfg.always_save_portable:
        print("portable:", em.save_portable(model.raw_cfg, model.portable_variables))


if __name__ == "__main__":
    main()
