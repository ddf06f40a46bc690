"""Config loading: reference-shaped YAML -> typed dataclass configs.

Parity target: the six reference recipes (`/root/reference/configs/*.yaml`)
and their Hydra/OmegaConf conventions (`???` mandatory markers,
`${model.x}` interpolation, `_target_` class keys). We honor the *schema* —
the six YAMLs port with at most key renames — but construction is explicit
dataclass mapping, not reflection (`Serialization.from_config_dict`,
common.py:424, is deliberately not mirrored: a registry of reflection-built
torch modules is not a good JAX pattern).
"""

from __future__ import annotations

import dataclasses
import re
import warnings
from typing import Any, Optional

import jax.numpy as jnp
import yaml

from conformer_nemo_tpu.audio.features import MelFeatureConfig
from conformer_nemo_tpu.audio.spec_augment import SpecAugmentConfig
from conformer_nemo_tpu.models.conformer import ConformerEncoderConfig
from conformer_nemo_tpu.models.ctc_model import CTCModelConfig

_INTERP = re.compile(r"^\$\{(.+)\}$")


def _resolve(node: Any, root: dict) -> Any:
    """Resolve `${a.b.c}` interpolations against the config root."""
    if isinstance(node, dict):
        return {k: _resolve(v, root) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve(v, root) for v in node]
    if isinstance(node, str):
        m = _INTERP.match(node)
        if m:
            cur: Any = root
            for part in m.group(1).split("."):
                cur = cur[part]
            return _resolve(cur, root)
    return node


def load_config(path: str, overrides: Optional[dict] = None, audit: bool = True) -> dict:
    """Load YAML + resolve interpolation + apply dotted-key overrides.

    audit=True warns about config keys nothing in the framework consumes —
    silent key swallowing is how recipe drift hides (a misspelled
    `val_check_interval` should not quietly change training behavior)."""
    with open(path, encoding="utf-8") as f:
        cfg = yaml.safe_load(f)
    if overrides:
        for dotted, value in overrides.items():
            cur = cfg
            parts = dotted.split(".")
            for p in parts[:-1]:
                cur = cur.setdefault(p, {})
            cur[parts[-1]] = value
    cfg = _resolve(cfg, cfg)
    if audit:
        for msg in audit_config(cfg):
            warnings.warn(msg, ConfigKeyWarning, stacklevel=2)
    return cfg


class ConfigKeyWarning(UserWarning):
    pass


_DS_KEYS = {
    "manifest_filepath", "sample_rate", "batch_size", "shuffle", "num_buckets",
    "trim_silence", "use_start_end_token", "augmentor", "num_workers",
    "bucketing_strategy", "bucketing_batch_size", "min_duration", "max_duration",
    "max_utts", "is_tarred", "tarred_audio_filepaths", "shuffle_n",
    "tarred_shard_strategy", "parser", "labels", "pin_memory", "drop_last",
    "bucketing_weights", "normalize_transcripts",
    # our extension (not a reference key): host->device wire format —
    # "f32" | "pcm16" | "mulaw8" (data/dataset.py BucketedLoader)
    "transport",
}
# accepted for reference-recipe compatibility but deliberate no-ops here;
# audited with an explanatory message instead of silence
_NOOP_KEYS = {
    "model.train_ds.pin_memory": "host buffers always transfer via async device_put",
    "model.validation_ds.pin_memory": "host buffers always transfer via async device_put",
    "model.test_ds.pin_memory": "host buffers always transfer via async device_put",
    "trainer.devices": "device topology comes from the jax runtime/mesh config",
    "trainer.gpus": "device topology comes from the jax runtime/mesh config",
    "trainer.num_nodes": "process topology comes from jax.distributed",
    "trainer.strategy": "parallelism is mesh-based (trainer.mesh), not DDP strategies",
    "trainer.accelerator": "device topology comes from the jax runtime",
    "trainer.precision": "precision policy is fixed: params fp32, compute bf16",
    "trainer.amp_level": "precision policy is fixed: params fp32, compute bf16",
    "trainer.amp_backend": "precision policy is fixed: params fp32, compute bf16",
}

_SECTION_KEYS = {
    "": {"name", "model", "trainer", "exp_manager", "init_from_nemo_model",
         "init_from_pretrained_model", "init_from_ptl_ckpt"},
    "model": {
        "sample_rate", "labels", "tokenizer", "train_ds", "validation_ds",
        "test_ds", "preprocessor", "spec_augment", "encoder", "decoder",
        "joint", "decoding", "optim", "model_defaults", "loss",
        "variational_noise", "skip_nan_grad", "ctc_reduction",
        "compute_eval_loss", "log_prediction", "log_every_n_steps",
        # config-only stanza in the reference fork too (read by no code
        # there either — SURVEY §0); kept for config-surface parity
        "gradient_mask",
    },
    "model.train_ds": _DS_KEYS, "model.validation_ds": _DS_KEYS,
    "model.test_ds": _DS_KEYS,
    "trainer": {
        "max_epochs", "max_steps", "log_every_n_steps",
        "accumulate_grad_batches", "gradient_clip_val", "val_check_interval",
        "check_val_every_n_epoch", "resume_from_checkpoint", "mesh",
        "enable_progress_bar", "num_sanity_val_steps", "sync_batchnorm",
        "benchmark", "logger", "enable_checkpointing", "max_time",
    } | {k.split(".", 1)[1] for k in _NOOP_KEYS if k.startswith("trainer.")},
    "exp_manager": {
        "exp_dir", "name", "version", "resume_if_exists",
        "resume_ignore_no_checkpoint", "create_checkpoint_callback",
        "checkpoint_callback_params", "create_wandb_logger",
        "wandb_logger_kwargs", "create_tensorboard_logger",
        "create_dllogger_logger", "log_every_n_steps",
    },
}


def audit_config(cfg: dict) -> list:
    """-> warning messages for unknown/no-op keys in audited sections.

    Sections without a schema entry (encoder, preprocessor, optim, ... whose
    builders already raise on bad dataclass fields, and opaque passthroughs
    like augmentor/decoding) are not audited."""
    msgs = []

    def walk(section: str, node):
        known = _SECTION_KEYS.get(section)
        if known is None or not isinstance(node, dict):
            return
        for key, val in node.items():
            path = f"{section}.{key}" if section else key
            if path in _NOOP_KEYS:
                msgs.append(f"config key '{path}' is accepted for reference "
                            f"compatibility but is a no-op here: {_NOOP_KEYS[path]}")
            elif key not in known and not key.startswith("_"):
                msgs.append(f"config key '{path}' is not consumed by anything "
                            "(typo, or an unsupported reference knob?)")
            walk(path, val)

    walk("", cfg)
    return msgs


def _pick(d: dict, names: dict) -> dict:
    """Select + rename keys present in `d` according to {yaml_key: field}."""
    out = {}
    for k, field in names.items():
        if k in d and d[k] is not None:
            out[field] = d[k]
    return out


def build_preprocessor_config(p: dict) -> MelFeatureConfig:
    kw = _pick(
        p,
        {
            "sample_rate": "sample_rate", "window_size": "window_size",
            "window_stride": "window_stride", "window": "window",
            "features": "features", "n_fft": "n_fft", "lowfreq": "lowfreq",
            "highfreq": "highfreq", "log": "log", "dither": "dither",
            "preemph": "preemph", "normalize": "normalize",
            "mag_power": "mag_power", "pad_to": "pad_to", "pad_value": "pad_value",
            "frame_splicing": "frame_splicing", "exact_pad": "exact_pad",
            "log_zero_guard_type": "log_zero_guard_type",
            "log_zero_guard_value": "log_zero_guard_value",
            "max_duration": "max_duration",
            "nb_augmentation_prob": "nb_augmentation_prob",
            "nb_max_freq": "nb_max_freq",
        },
    )
    # normalize may arrive as the reference's dict form
    # {'fixed_mean': [...], 'fixed_std': [...]} (features.py:78-81)
    norm = kw.get("normalize")
    if isinstance(norm, dict):
        kw["normalize"] = "fixed_mean_and_std"
        kw["fixed_mean"] = tuple(norm["fixed_mean"])
        kw["fixed_std"] = tuple(norm["fixed_std"])
    for key in ("fixed_mean", "fixed_std"):
        if key in p and p[key] is not None:
            kw[key] = tuple(p[key])
    return MelFeatureConfig(**kw)


def build_spec_augment_config(s: dict) -> SpecAugmentConfig:
    kw = _pick(
        s,
        {
            "freq_masks": "freq_masks", "time_masks": "time_masks",
            "freq_width": "freq_width", "time_width": "time_width",
            "rect_masks": "rect_masks", "rect_time": "rect_time",
            "rect_freq": "rect_freq", "specshot_ratio": "specshot_ratio",
            "augmask_value": "augmask_value",
        },
    )
    return SpecAugmentConfig(**kw)


def build_encoder_config(e: dict, dtype=jnp.bfloat16) -> ConformerEncoderConfig:
    kw = _pick(
        e,
        {
            "feat_in": "feat_in", "n_layers": "n_layers", "d_model": "d_model",
            "feat_out": "feat_out", "subsampling": "subsampling",
            "subsampling_factor": "subsampling_factor",
            "subsampling_conv_channels": "subsampling_conv_channels",
            "ff_expansion_factor": "ff_expansion_factor",
            "self_attention_model": "self_attention_model",
            "n_heads": "n_heads", "xscaling": "xscaling",
            "untie_biases": "untie_biases", "pos_emb_max_len": "pos_emb_max_len",
            "conv_kernel_size": "conv_kernel_size", "conv_norm_type": "conv_norm_type",
            "dropout": "dropout", "dropout_emb": "dropout_emb",
            "dropout_att": "dropout_att",
            # our extensions (not reference keys): long-form training knobs,
            # policy measured in docs/PERFORMANCE.md
            "remat": "remat",
            "use_flash_attention": "use_flash_attention",
            "flash_attention_min_t": "flash_attention_min_t",
        },
    )
    if e.get("att_context_size"):
        kw["att_context_size"] = tuple(e["att_context_size"])
    return ConformerEncoderConfig(dtype=dtype, **kw)


def build_ctc_model_config(
    cfg: dict, vocab_size: Optional[int] = None, dtype=jnp.bfloat16
) -> CTCModelConfig:
    """model-section dict (reference shape) -> CTCModelConfig.

    vocab_size: V (blank becomes V); defaults to len(model.labels) for char
    configs (decoder num_classes semantics, conv_asr.py:424-434)."""
    m = cfg["model"] if "model" in cfg else cfg
    if vocab_size is None:
        labels = m.get("labels")
        if labels is None:
            raise ValueError("vocab_size required for BPE configs")
        vocab_size = len(labels)
    enc = build_encoder_config(m.get("encoder", {}), dtype=dtype)
    return CTCModelConfig(
        preprocessor=build_preprocessor_config(m.get("preprocessor", {})),
        spec_augment=build_spec_augment_config(m.get("spec_augment", {}) or {}),
        encoder=enc,
        num_classes=vocab_size,
        ctc_reduction=m.get("ctc_reduction", "mean_batch"),
    )
