"""Optimizer factory (optax).

Parity target: reference `get_optimizer` registry
(`/root/reference/nemo/core/optim/optimizers.py:32-43,161`) — sgd/adam/adamw/
adadelta/adamax/adagrad/rmsprop/rprop/novograd/adafactor — consumed from
`cfg.optim` the way `ModelPT.setup_optimization` does (modelPT.py:428).
(The apex-only `lamb`/`fused_adam` entries are CUDA-specific and omitted.)
"""

from __future__ import annotations

from typing import Callable, Optional

import optax


def make_optimizer(
    name: str,
    lr_schedule: Callable,
    *,
    weight_decay: float = 0.0,
    betas: tuple = (0.9, 0.98),
    eps: float = 1e-8,
    momentum: float = 0.9,
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    name = name.lower()
    if name == "adamw":
        opt = optax.adamw(lr_schedule, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)
    elif name == "adam":
        opt = optax.adam(lr_schedule, b1=betas[0], b2=betas[1], eps=eps)
    elif name == "sgd":
        opt = optax.sgd(lr_schedule, momentum=momentum)
    elif name == "novograd":
        opt = optax.novograd(lr_schedule, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)
    elif name == "adafactor":
        opt = optax.adafactor(lr_schedule)
    elif name == "adadelta":
        opt = optax.adadelta(lr_schedule, eps=eps)
    elif name == "adamax":
        opt = optax.adamax(lr_schedule, b1=betas[0], b2=betas[1], eps=eps)
    elif name == "adagrad":
        opt = optax.adagrad(lr_schedule, eps=eps)
    elif name == "rmsprop":
        opt = optax.rmsprop(lr_schedule, eps=eps, momentum=momentum)
    elif name == "rprop":
        # rprop's lr is an initial per-weight step size, not a schedule
        # (same semantics as torch.optim.Rprop's lr argument)
        lr0 = lr_schedule(0) if callable(lr_schedule) else lr_schedule
        opt = optax.rprop(float(lr0))
    else:
        raise ValueError(f"unknown optimizer {name}")
    if grad_clip and grad_clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    return opt


def with_grad_accumulation(
    opt: optax.GradientTransformation, every: int
) -> optax.GradientTransformation:
    """Gradient accumulation (reference trainer.accumulate_grad_batches,
    configs/conformer_ctc_bpe.yaml:167): averages grads over `every`
    micro-batches before applying the update."""
    if every <= 1:
        return opt
    return optax.MultiSteps(opt, every_k_schedule=every)
