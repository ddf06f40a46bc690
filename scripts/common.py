"""Shared CLI plumbing: hydra-style dotted overrides on argv.

Parity target: the reference entry-point convention
(`python examples/asr/asr_ctc/speech_to_text_ctc.py model.train_ds.
manifest_filepath=... trainer.devices=...`, Jenkinsfile:264), minus Hydra
itself — a flat `key.path=value` parser over our YAML loader.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    # honor the env var even though the TPU plugin self-registers
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def parse_overrides(argv):
    """['a.b=1', '+c.d=x'] -> ({'a.b': 1, 'c.d': 'x'}, leftover_args)."""
    overrides, leftover = {}, []
    for arg in argv:
        if "=" in arg and not arg.startswith("-"):
            key, _, val = arg.partition("=")
            key = key.lstrip("+")
            overrides[key] = _coerce(val)
        else:
            leftover.append(arg)
    return overrides, leftover


def _coerce(val: str):
    low = val.lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("null", "none"):
        return None
    for cast in (int, float):
        try:
            return cast(val)
        except ValueError:
            pass
    return val


def build_exp_manager(raw_cfg):
    from conformer_nemo_tpu.train.exp_manager import ExpManagerConfig, ExperimentManager

    em = raw_cfg.get("exp_manager") or {}
    if not em.get("create_checkpoint_callback", True) and not em.get("exp_dir"):
        return None
    cb = em.get("checkpoint_callback_params") or {}
    return ExperimentManager(
        ExpManagerConfig(
            exp_dir=em.get("exp_dir"),
            name=str(em.get("name") or raw_cfg.get("name") or "run"),
            resume_if_exists=bool(em.get("resume_if_exists", False)),
            resume_ignore_no_checkpoint=bool(em.get("resume_ignore_no_checkpoint", False)),
            monitor=cb.get("monitor", "val_wer"),
            mode=cb.get("mode", "min"),
            save_top_k=int(cb.get("save_top_k", 5)),
            always_save_portable=bool(cb.get("always_save_portable",
                                             cb.get("always_save_nemo", True))),
            create_wandb_logger=bool(em.get("create_wandb_logger", False)),
            wandb_logger_kwargs=em.get("wandb_logger_kwargs"),
            create_tensorboard_logger=bool(em.get("create_tensorboard_logger", True)),
        )
    )
