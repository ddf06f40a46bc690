"""LR schedules as optax-compatible step -> lr callables.

Parity targets (math only): reference `nemo/core/optim/lr_scheduler.py` —
NoamAnnealing (:444), CosineAnnealing (:393), WarmupPolicy linear warmup,
InverseSquareRootAnnealing. The reference's registry keyed by `cfg.optim.sched.name`
is mirrored by `make_lr_schedule`.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax.numpy as jnp


def noam_annealing(
    base_lr: float,
    d_model: int,
    warmup_steps: int,
    min_lr: float = 0.0,
    max_steps: Optional[int] = None,
) -> Callable:
    """lr = base * d_model^-0.5 * min(step^-0.5, step * warmup^-1.5), min_lr
    floor applied after warmup (lr_scheduler.py:487-493)."""
    normalize = d_model ** (-0.5)

    def schedule(step):
        s = jnp.maximum(step.astype(jnp.float32) if hasattr(step, "astype") else float(max(step, 1)), 1.0)
        mult = normalize * jnp.minimum(s ** -0.5, s * warmup_steps ** -1.5)
        lr = base_lr * mult
        lr = jnp.where(s > warmup_steps, jnp.maximum(lr, min_lr), lr)
        if max_steps is not None:
            lr = jnp.where(s > max_steps, min_lr, lr)
        return lr

    return schedule


def cosine_annealing(
    base_lr: float,
    max_steps: int,
    warmup_steps: int = 0,
    min_lr: float = 0.0,
) -> Callable:
    """Linear warmup then cosine to min_lr (lr_scheduler.py:322-325,393-416)."""

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        warm = base_lr * s / max(warmup_steps, 1)
        t = jnp.clip((s - warmup_steps) / max(max_steps - warmup_steps, 1), 0.0, 1.0)
        cos = (base_lr - min_lr) * 0.5 * (1 + jnp.cos(math.pi * t)) + min_lr
        return jnp.where((warmup_steps > 0) & (s < warmup_steps), warm, cos)

    return schedule


def inverse_sqrt_annealing(base_lr: float, warmup_steps: int, min_lr: float = 0.0) -> Callable:
    def schedule(step):
        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        warm = base_lr * s / max(warmup_steps, 1)
        decay = base_lr * (warmup_steps ** 0.5) * s ** -0.5
        lr = jnp.where(s < warmup_steps, warm, jnp.maximum(decay, min_lr))
        return lr

    return schedule


def make_lr_schedule(cfg: dict, base_lr: float) -> Callable:
    """Build from a reference-shaped `optim.sched` dict (cfg surface:
    configs/conformer_ctc_bpe.yaml:154-160)."""
    name = cfg.get("name", "NoamAnnealing")
    base_lr = float(base_lr)
    # note: PyYAML parses bare scientific notation ('1e-6') as str — coerce.
    min_lr = float(cfg.get("min_lr") or 0.0)
    max_steps = cfg.get("max_steps")
    max_steps = int(max_steps) if max_steps else None
    if name == "NoamAnnealing":
        warmup = cfg.get("warmup_steps")
        if warmup is None and cfg.get("warmup_ratio") is not None:
            warmup = int(float(cfg["warmup_ratio"]) * max_steps)
        return noam_annealing(
            base_lr,
            d_model=int(cfg["d_model"]),
            warmup_steps=int(warmup or 0) or 1,
            min_lr=min_lr,
            max_steps=max_steps,
        )
    if name == "CosineAnnealing":
        return cosine_annealing(
            base_lr,
            max_steps=max_steps,
            warmup_steps=int(cfg.get("warmup_steps") or 0),
            min_lr=min_lr,
        )
    if name == "InverseSquareRootAnnealing":
        return inverse_sqrt_annealing(
            base_lr, warmup_steps=int(cfg.get("warmup_steps") or 1), min_lr=min_lr
        )
    raise ValueError(f"unknown scheduler {name}")
