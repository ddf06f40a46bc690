"""LR schedules as optax-compatible step -> lr callables.

Parity targets (math only): reference `nemo/core/optim/lr_scheduler.py` —
the full AVAILABLE_SCHEDULERS registry (:881-896): WarmupPolicy (:34),
WarmupHoldPolicy (:141), SquareAnnealing (:364), SquareRootAnnealing (:381),
CosineAnnealing (:393), NoamAnnealing (:444), WarmupAnnealing (:495),
InverseSquareRootAnnealing (:506), T5InverseSquareRootAnnealing (:516),
PolynomialDecayAnnealing (:524), PolynomialHoldDecayAnnealing (:546), plus
the torch built-ins StepLR/ExponentialLR. ReduceLROnPlateau/CyclicLR are
metric-driven / stateful torch schedulers with no step->lr closed form; they
are intentionally unsupported (documented error in `make_lr_schedule`).
The registry keyed by `cfg.optim.sched.name` is mirrored by
`make_lr_schedule`.
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


def warmup_policy(
    anneal,
    base_lr: float,
    warmup_steps: int = 0,
    max_steps: Optional[int] = None,
    min_lr: float = 0.0,
) -> Callable:
    """Reference WarmupPolicy.get_lr (:71-83): linear warmup
    lr = base * (step+1)/(warmup+1) while step <= warmup; min_lr after
    max_steps; otherwise `anneal(step)`. `anneal` is a step -> lr callable
    (already closed over base_lr/min_lr)."""

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        warm = base_lr * (s + 1.0) / (warmup_steps + 1.0)
        lr = anneal(s)
        if warmup_steps > 0:
            lr = jnp.where(s <= warmup_steps, warm, lr)
        if max_steps is not None:
            lr = jnp.where(s > max_steps, min_lr, lr)
        return lr

    return schedule


def square_annealing(base_lr, max_steps, warmup_steps=0, min_lr=1e-5):
    """mult = ((D - s')/D)^2 with s' = step - warmup, D = max - warmup
    (SquareAnnealing:364 + _square_annealing:315)."""
    d = max(max_steps - warmup_steps, 1)

    def anneal(s):
        mult = jnp.clip((d - (s - warmup_steps)) / d, 0.0, None) ** 2
        return jnp.maximum(base_lr * mult, min_lr)

    return warmup_policy(anneal, base_lr, warmup_steps, max_steps, min_lr)


def squareroot_annealing(base_lr, max_steps, warmup_steps=0, min_lr=0.0):
    """mult = ((max - step)/max)^0.5 on the RAW step
    (SquareRootAnnealing:381 + _squareroot_annealing:308)."""

    def anneal(s):
        mult = jnp.sqrt(jnp.clip((max_steps - s) / max_steps, 0.0, None))
        return jnp.maximum(base_lr * mult, min_lr)

    return warmup_policy(anneal, base_lr, warmup_steps, max_steps, min_lr)


def warmup_annealing(base_lr, max_steps, warmup_steps=0, min_lr=0.0):
    """Linear decay base -> min_lr over (warmup, max] (WarmupAnnealing:495)."""
    d = max(max_steps - warmup_steps, 1)

    def anneal(s):
        mult = (s - warmup_steps) / d
        return min_lr + (1.0 - mult) * (base_lr - min_lr)

    return warmup_policy(anneal, base_lr, warmup_steps, max_steps, min_lr)


def t5_inverse_sqrt_annealing(constant_steps, max_steps, min_lr=0.0):
    """lr = 1/sqrt(step), held at 1/sqrt(constant_steps) during the constant
    period (T5InverseSquareRootAnnealing:516 over SquareRootConstantPolicy:88).
    Note the reference ignores base_lr here — so do we."""
    constant_lr = 1.0 / (constant_steps ** 0.5) if constant_steps else 1.0

    def schedule(step):
        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        lr = 1.0 / jnp.sqrt(s)
        if constant_steps:
            lr = jnp.where(s <= constant_steps, constant_lr, lr)
        if max_steps is not None:
            lr = jnp.where(s > max_steps, min_lr, lr)
        return lr

    return schedule


def polynomial_decay_annealing(
    base_lr, max_steps, warmup_steps=0, min_lr=0.0, power=1.0, cycle=False,
    hold_steps=0,
):
    """(base - min) * (1 - s'/D)^power + min with s' = step - max(warmup,hold)
    offset semantics of PolynomialDecayAnnealing:524 /
    PolynomialHoldDecayAnnealing:546 (+_poly_decay:352)."""
    offset = hold_steps if hold_steps else warmup_steps
    d0 = max(max_steps - max(warmup_steps, hold_steps), 1)

    def anneal(s):
        sp = s - offset
        if cycle:
            mult = jnp.maximum(jnp.ceil(sp / d0), 1.0)
            d = d0 * mult
        else:
            d = d0
            sp = jnp.minimum(sp, d)
        p = jnp.clip(sp / d, 0.0, 1.0)
        return (base_lr - min_lr) * (1.0 - p) ** power + min_lr

    sched = warmup_policy(anneal, base_lr, warmup_steps, max_steps, min_lr)
    if hold_steps and hold_steps > warmup_steps:
        inner = sched

        def held(step):
            s = jnp.asarray(step, jnp.float32)
            # WarmupHoldPolicy (:141): keep base_lr between warmup and hold
            return jnp.where((s > warmup_steps) & (s < hold_steps),
                             base_lr, inner(s))

        return held
    return sched


def step_lr(base_lr, step_size, gamma=0.1):
    """torch StepLR: lr = base * gamma^(step // step_size)."""

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        return base_lr * gamma ** jnp.floor(s / step_size)

    return schedule


def exponential_lr(base_lr, gamma):
    """torch ExponentialLR: lr = base * gamma^step."""

    def schedule(step):
        return base_lr * gamma ** jnp.asarray(step, jnp.float32)

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
    warmup = int(cfg.get("warmup_steps") or 0)
    if warmup == 0 and cfg.get("warmup_ratio") is not None and max_steps:
        warmup = int(float(cfg["warmup_ratio"]) * max_steps)
    if name == "WarmupPolicy":
        return warmup_policy(lambda s: jnp.asarray(base_lr, jnp.float32),
                             base_lr, warmup, max_steps, min_lr)
    if name == "SquareAnnealing":
        return square_annealing(base_lr, max_steps, warmup,
                                min_lr=float(cfg.get("min_lr") or 1e-5))
    if name == "SquareRootAnnealing":
        return squareroot_annealing(base_lr, max_steps, warmup, min_lr)
    if name == "WarmupAnnealing":
        return warmup_annealing(base_lr, max_steps, warmup, min_lr)
    if name == "T5InverseSquareRootAnnealing":
        return t5_inverse_sqrt_annealing(
            int(cfg.get("constant_steps") or 0), max_steps, min_lr)
    if name in ("PolynomialDecayAnnealing", "PolynomialHoldDecayAnnealing"):
        return polynomial_decay_annealing(
            base_lr, max_steps, warmup, min_lr,
            power=float(cfg.get("power") or 1.0),
            cycle=bool(cfg.get("cycle", False)),
            hold_steps=int(cfg.get("hold_steps") or 0)
            if name == "PolynomialHoldDecayAnnealing" else 0,
        )
    if name == "StepLR":
        return step_lr(base_lr, int(cfg.get("step_size") or 1),
                       gamma=float(cfg.get("gamma") or 0.1))
    if name == "ExponentialLR":
        return exponential_lr(base_lr, float(cfg.get("gamma") or 0.9))
    if name in ("ReduceLROnPlateau", "CyclicLR"):
        raise ValueError(
            f"{name} is metric-driven/stateful and has no pure step->lr form; "
            "use a closed-form scheduler from this registry")
    raise ValueError(f"unknown scheduler {name}")
