"""Experiment orchestration: run dirs, logging, auto-resume, checkpoints.

Parity target: reference `exp_manager`
(`/root/reference/nemo/utils/exp_manager.py:165`): versioned run dirs
(exp_dir/name/version), resume-if-exists from '*last*', metric-monitored
top-k checkpointing, TensorBoard-style scalar logging, git-info capture.

TensorBoard event files require no TF: we write scalars both as JSONL
(always) and TB event files when tensorboardX/tensorflow is importable.
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import time
from typing import Optional

from conformer_nemo_tpu.train import checkpoint as ckpt


@dataclasses.dataclass
class ExpManagerConfig:
    exp_dir: Optional[str] = None
    name: str = "default"
    version: Optional[str] = None
    resume_if_exists: bool = False
    resume_ignore_no_checkpoint: bool = False
    create_checkpoint_callback: bool = True
    monitor: str = "val_wer"
    mode: str = "min"
    save_top_k: int = 5
    always_save_portable: bool = True
    log_every_n_steps: int = 10
    # serialize+write checkpoints on a background thread (the device->host
    # copy stays synchronous — the train step donates its buffers)
    async_checkpointing: bool = True
    # W&B logging (reference exp_manager create_wandb_logger /
    # wandb_logger_kwargs, exp_manager.py:622): enabled only when the wandb
    # package is importable; otherwise a warning is logged and training
    # proceeds (this image has no network egress).
    create_wandb_logger: bool = False
    wandb_logger_kwargs: Optional[dict] = None
    create_tensorboard_logger: bool = True


class ScalarLogger:
    """JSONL scalar logger (+ optional TB events if tensorboardX exists,
    + optional W&B run if requested and wandb is importable)."""

    def __init__(self, log_dir: str, wandb_kwargs: Optional[dict] = None,
                 tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        self._wandb = None
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter  # optional

                self._tb = SummaryWriter(log_dir)
            except Exception:
                pass
        if wandb_kwargs is not None:
            try:
                import wandb  # optional

                self._wandb = wandb.init(dir=log_dir, **wandb_kwargs)
            except Exception as e:  # no package / no network: degrade loudly
                print(f"[exp_manager] wandb logging requested but unavailable: {e}")

    def log(self, step: int, **scalars):
        rec = {"step": step, "time": time.time(), **{k: float(v) for k, v in scalars.items()}}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)
        if self._wandb:
            self._wandb.log({k: float(v) for k, v in scalars.items()}, step=step)

    def close(self):
        self._f.close()
        if self._tb:
            self._tb.close()
        if self._wandb:
            self._wandb.finish()


class ExperimentManager:
    def __init__(self, cfg: ExpManagerConfig):
        self.cfg = cfg
        exp_dir = cfg.exp_dir or "./experiments"
        version = cfg.version
        if version is None:
            base = os.path.join(exp_dir, cfg.name)
            n = 0
            while os.path.exists(os.path.join(base, f"version_{n}")) and not cfg.resume_if_exists:
                n += 1
            if cfg.resume_if_exists and os.path.exists(base):
                versions = sorted(
                    (v for v in os.listdir(base) if v.startswith("version_")),
                    key=lambda v: int(v.split("_")[1]),
                )
                if versions:
                    n = int(versions[-1].split("_")[1])
            version = f"version_{n}"
        self.run_dir = os.path.join(exp_dir, cfg.name, version)
        self.ckpt_dir = os.path.join(self.run_dir, "checkpoints")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.logger = ScalarLogger(
            self.run_dir,
            (cfg.wandb_logger_kwargs or {}) if cfg.create_wandb_logger else None,
            tensorboard=cfg.create_tensorboard_logger,
        )
        self._write_env_info()

    def _write_env_info(self):
        try:
            git = subprocess.run(
                ["git", "rev-parse", "HEAD"], capture_output=True, text=True, timeout=5
            ).stdout.strip()
        except Exception:
            git = "unknown"
        with open(os.path.join(self.run_dir, "run-info.json"), "w") as f:
            json.dump({"git": git, "argv": os.sys.argv, "time": time.time()}, f)

    def maybe_resume(self, state_template):
        """-> (state or None, meta or None); honors resume_if_exists."""
        if not self.cfg.resume_if_exists:
            return None, None
        state, meta = ckpt.restore_train_state(self.ckpt_dir, state_template)
        if state is None and not self.cfg.resume_ignore_no_checkpoint:
            raise FileNotFoundError(
                f"resume_if_exists=True but no checkpoint found in {self.ckpt_dir}"
            )
        return state, meta

    def save(self, state, step: int, metrics: Optional[dict] = None):
        if not self.cfg.create_checkpoint_callback:
            return
        if self.cfg.async_checkpointing:
            self.wait_for_saves()  # at most one save in flight
            fut = ckpt.save_train_state_async(self.ckpt_dir, state, step, metrics)

            def _then_prune(f):
                ckpt.prune_checkpoints(
                    self.ckpt_dir, self.cfg.save_top_k, self.cfg.monitor,
                    self.cfg.mode)

            fut.add_done_callback(_then_prune)
            self._pending_save = fut
            return
        ckpt.save_train_state(self.ckpt_dir, state, step, metrics)
        ckpt.prune_checkpoints(
            self.ckpt_dir, self.cfg.save_top_k, self.cfg.monitor, self.cfg.mode
        )

    def wait_for_saves(self):
        """Block until the in-flight async checkpoint (if any) is on disk."""
        fut = getattr(self, "_pending_save", None)
        if fut is not None:
            fut.result()
            self._pending_save = None

    def save_portable(self, config: dict, params, artifacts=None, name: Optional[str] = None):
        out = os.path.join(self.run_dir, (name or self.cfg.name) + ".cntpu")
        ckpt.save_portable(out, config, params, artifacts)
        return out
