"""Convert a reference NeMo checkpoint to our portable .cntpu archive.

Usage:
  python scripts/convert_nemo.py model.nemo out.cntpu
  python scripts/convert_nemo.py model.ckpt out.cntpu --config model_config.yaml

Covers `Model.restore_from('x.nemo')` interop
(`/root/reference/nemo/core/classes/modelPT.py:258`): any released NeMo 1.x
Conformer CTC/RNN-T checkpoint becomes servable by
`ConformerCTC.restore_portable` / `from_pretrained`.
"""

import argparse
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp


def detect_model_type(sd: dict) -> str:
    return "rnnt" if any(k.startswith("joint.") for k in sd) else "ctc"


def convert(in_path: str, out_path: str, config_path: str = None,
            model_type: str = "auto") -> str:
    from conformer_nemo_tpu.config.loader import (
        build_ctc_model_config, build_encoder_config)
    from conformer_nemo_tpu.convert.nemo_archive import (
        load_nemo_archive, load_torch_weights, strip_targets)
    from conformer_nemo_tpu.convert.nemo_weights import (
        convert_ctc_model_state, convert_rnnt_model_state)
    from conformer_nemo_tpu.train.checkpoint import save_portable

    artifacts = {}
    if in_path.endswith(".nemo") or config_path is None:
        config, sd, artifacts = load_nemo_archive(in_path)
    else:
        import yaml

        sd = load_torch_weights(in_path)
        with open(config_path, encoding="utf-8") as f:
            config = yaml.safe_load(f)
    m = strip_targets(config)
    if "model" in m:  # lightning-style config wraps the model section
        m = m["model"]
    if model_type == "auto":
        model_type = detect_model_type(sd)

    if model_type == "ctc":
        vocab = int(sd["decoder.decoder_layers.0.weight"].shape[0]) - 1
        cfg = build_ctc_model_config({"model": m}, vocab_size=vocab, dtype=jnp.float32)
        variables = convert_ctc_model_state(sd, cfg)
    else:
        from conformer_nemo_tpu.models.rnnt import (
            RNNTDecoderConfig, RNNTJointConfig, RNNTModelConfig)

        vocab = int(sd["decoder.prediction.embed.weight"].shape[0]) - 1
        enc = build_encoder_config(m.get("encoder", {}), dtype=jnp.float32)
        defaults = m.get("model_defaults", {}) or {}
        dcfg = m.get("decoder", {}) or {}
        prednet = dcfg.get("prednet", {}) or {}
        jointnet = (m.get("joint", {}) or {}).get("jointnet", {}) or {}
        mcfg = RNNTModelConfig(
            encoder=enc,
            decoder=RNNTDecoderConfig(
                vocab_size=vocab,
                pred_hidden=prednet.get("pred_hidden", defaults.get("pred_hidden", 640)),
                pred_rnn_layers=prednet.get("pred_rnn_layers", 1),
                forget_gate_bias=float(prednet.get("forget_gate_bias", 1.0)),
                t_max=prednet.get("t_max"),
                norm=dcfg.get("normalization_mode"),
                blank_as_pad=bool(dcfg.get("blank_as_pad", True)),
                dtype=jnp.float32,
            ),
            joint=RNNTJointConfig(
                joint_hidden=jointnet.get("joint_hidden", defaults.get("joint_hidden", 640)),
                activation=jointnet.get("activation", "relu"),
                dtype=jnp.float32,
            ),
        )
        variables = convert_rnnt_model_state(sd, mcfg)

    # unmangle tokenizer artifacts into stable names for the archive
    art_out = {}
    tmp = tempfile.mkdtemp(prefix="cntpu_conv_")
    tok_cfg = m.get("tokenizer") or {}
    if tok_cfg.get("type") == "agg":
        # multilang archive: per-language artifacts registered as
        # `tokenizer.langs.{lang}.model_path` = "nemo:<md5>_tokenizer.model"
        # (mixins.py:236); store each under a unique flat basename and
        # rewrite the config to the converted-archive layout
        new_langs = {}
        for lang, sub in (tok_cfg.get("langs") or {}).items():
            sub = dict(sub or {})
            # the reference registers wpe sub-tokenizers via vocab artifacts
            # (mixins.py), not a SentencePiece model file; carrying one
            # through the model_path scheme below would silently load it as
            # SentencePiece — reject loudly instead
            if sub.get("type", "bpe") != "bpe":
                raise NotImplementedError(
                    f"multilang archive: sub-tokenizer type "
                    f"{sub.get('type')!r} for lang {lang!r} is not supported "
                    "by the converter (only 'bpe'/SentencePiece sub-"
                    "tokenizers; agg+wpe archives register vocab artifacts "
                    "the converter does not carry)")
            member = str(sub.get("model_path") or sub.get("dir") or "")
            if member.startswith("nemo:"):
                member = member[len("nemo:"):]
            member = os.path.basename(member)
            src = artifacts.get(member)
            if src is None:  # fall back: `dir`-style registration
                src = artifacts.get(f"{lang}_tokenizer.model")
            if src is None:
                raise FileNotFoundError(
                    f"multilang archive: no tokenizer artifact for lang "
                    f"{lang!r} (looked for {member!r})")
            base = f"tokenizer_{lang}.model"
            dst = os.path.join(tmp, base)
            shutil.copy(src, dst)
            art_out[base] = dst
            new_langs[lang] = {"type": sub.get("type", "bpe"), "model_file": base}
        m["tokenizer"] = {"type": "agg", "langs": new_langs}
    else:
        for want in ("tokenizer.model", "tokenizer.vocab", "vocab.txt",
                     "tokenizer.json", "merges.txt", "vocab.json"):
            if want in artifacts:
                dst = os.path.join(tmp, want)
                shutil.copy(artifacts[want], dst)
                art_out[want] = dst

    save_portable(out_path, {"model": m}, variables, art_out or None)
    shutil.rmtree(tmp, ignore_errors=True)
    return model_type


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", help=".nemo archive or torch .ckpt")
    ap.add_argument("output", help="output .cntpu path")
    ap.add_argument("--config", default=None,
                    help="model_config.yaml (required for bare .ckpt inputs)")
    ap.add_argument("--model-type", default="auto", choices=["auto", "ctc", "rnnt"])
    args = ap.parse_args()
    mt = convert(args.input, args.output, args.config, args.model_type)
    print(f"converted {args.input} ({mt}) -> {args.output}")


if __name__ == "__main__":
    main()
