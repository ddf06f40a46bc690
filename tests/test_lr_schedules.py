"""LR scheduler registry parity vs pure-Python oracles of the reference
formulas (nemo/core/optim/lr_scheduler.py:308-360 helpers + policy get_lr
dispatch :71-83, :126-136)."""

import math

import numpy as np
import pytest

from conformer_nemo_tpu.train.lr_schedule import make_lr_schedule

BASE = 0.5
MAX_STEPS = 200
WARMUP = 20


def _oracle_warmup_dispatch(step, warmup, max_steps, min_lr, get_lr):
    """WarmupPolicy.get_lr (:71-83)."""
    if step <= warmup and warmup > 0:
        return BASE * (step + 1) / (warmup + 1)
    if step > max_steps:
        return min_lr
    return get_lr(step)


def _sweep(sched, oracle, steps=range(0, 260, 7)):
    for s in steps:
        got = float(sched(np.int32(s)))
        want = oracle(s)
        assert got == pytest.approx(want, rel=1e-5, abs=1e-8), (s, got, want)


def test_warmup_policy_const():
    sched = make_lr_schedule(
        {"name": "WarmupPolicy", "warmup_steps": WARMUP, "max_steps": MAX_STEPS,
         "min_lr": 1e-4}, BASE)
    _sweep(sched, lambda s: _oracle_warmup_dispatch(
        s, WARMUP, MAX_STEPS, 1e-4, lambda st: BASE))


def test_square_annealing():
    min_lr = 1e-5

    def get_lr(step):
        mult = ((MAX_STEPS - WARMUP - (step - WARMUP)) / (MAX_STEPS - WARMUP)) ** 2
        return max(BASE * mult, min_lr)

    sched = make_lr_schedule(
        {"name": "SquareAnnealing", "warmup_steps": WARMUP,
         "max_steps": MAX_STEPS, "min_lr": min_lr}, BASE)
    _sweep(sched, lambda s: _oracle_warmup_dispatch(
        s, WARMUP, MAX_STEPS, min_lr, get_lr))


def test_squareroot_annealing():
    def get_lr(step):
        # raw step (reference SquareRootAnnealing:385)
        return max(BASE * ((MAX_STEPS - step) / MAX_STEPS) ** 0.5, 0.0)

    sched = make_lr_schedule(
        {"name": "SquareRootAnnealing", "warmup_steps": WARMUP,
         "max_steps": MAX_STEPS}, BASE)
    _sweep(sched, lambda s: _oracle_warmup_dispatch(
        s, WARMUP, MAX_STEPS, 0.0, get_lr))


def test_warmup_annealing():
    min_lr = 1e-4

    def get_lr(step):
        mult = (step - WARMUP) / (MAX_STEPS - WARMUP)
        return min_lr + (1 - mult) * (BASE - min_lr)

    sched = make_lr_schedule(
        {"name": "WarmupAnnealing", "warmup_steps": WARMUP,
         "max_steps": MAX_STEPS, "min_lr": min_lr}, BASE)
    _sweep(sched, lambda s: _oracle_warmup_dispatch(
        s, WARMUP, MAX_STEPS, min_lr, get_lr))


def test_t5_inverse_sqrt():
    const = 10

    def oracle(step):
        if step <= const:
            return 1 / const ** 0.5
        if step > MAX_STEPS:
            return 0.0
        return 1 / step ** 0.5

    sched = make_lr_schedule(
        {"name": "T5InverseSquareRootAnnealing", "constant_steps": const,
         "max_steps": MAX_STEPS}, BASE)
    _sweep(sched, oracle, steps=range(1, 260, 7))


@pytest.mark.parametrize("power,cycle", [(1.0, False), (2.0, False), (1.0, True)])
def test_polynomial_decay(power, cycle):
    min_lr = 1e-4

    def poly(step):
        # _poly_decay(:352) with step' = step - warmup, D = max - warmup
        sp, d = step - WARMUP, MAX_STEPS - WARMUP
        if cycle:
            mult = 1.0 if sp == 0 else math.ceil(sp / d)
            d = d * mult
        else:
            sp = min(sp, d)
        p = sp / d
        return (BASE - min_lr) * (1.0 - p) ** power + min_lr

    sched = make_lr_schedule(
        {"name": "PolynomialDecayAnnealing", "warmup_steps": WARMUP,
         "max_steps": MAX_STEPS, "min_lr": min_lr, "power": power,
         "cycle": cycle}, BASE)
    _sweep(sched, lambda s: _oracle_warmup_dispatch(
        s, WARMUP, MAX_STEPS, min_lr, poly),
        steps=range(1, MAX_STEPS + 1, 7))


def test_polynomial_hold_decay():
    hold = 50
    min_lr = 1e-4
    sched = make_lr_schedule(
        {"name": "PolynomialHoldDecayAnnealing", "warmup_steps": WARMUP,
         "max_steps": MAX_STEPS, "min_lr": min_lr, "power": 1.0,
         "hold_steps": hold}, BASE)
    # hold region keeps base lr (WarmupHoldPolicy:141)
    assert float(sched(np.int32(30))) == pytest.approx(BASE)
    assert float(sched(np.int32(hold - 1))) == pytest.approx(BASE)
    # decay starts from hold
    d = MAX_STEPS - max(WARMUP, hold)
    want = (BASE - min_lr) * (1.0 - (100 - hold) / d) + min_lr
    assert float(sched(np.int32(100))) == pytest.approx(want, rel=1e-5)
    assert float(sched(np.int32(MAX_STEPS + 10))) == pytest.approx(min_lr)


def test_step_and_exponential():
    sched = make_lr_schedule({"name": "StepLR", "step_size": 30, "gamma": 0.5},
                             BASE)
    assert float(sched(np.int32(0))) == pytest.approx(BASE)
    assert float(sched(np.int32(59))) == pytest.approx(BASE * 0.5)
    assert float(sched(np.int32(61))) == pytest.approx(BASE * 0.25)

    sched = make_lr_schedule({"name": "ExponentialLR", "gamma": 0.99}, BASE)
    assert float(sched(np.int32(10))) == pytest.approx(BASE * 0.99 ** 10,
                                                       rel=1e-5)


def test_unsupported_raise():
    with pytest.raises(ValueError):
        make_lr_schedule({"name": "ReduceLROnPlateau"}, BASE)
    with pytest.raises(ValueError):
        make_lr_schedule({"name": "NoSuchSched"}, BASE)


def test_optimizer_registry_full_set():
    """Every optimizer in the reference AVAILABLE_OPTIMIZERS registry
    (reference optimizers.py:32-43, minus the apex-only CUDA entries) builds
    and produces a finite update."""
    import jax
    import jax.numpy as jnp
    import optax

    from conformer_nemo_tpu.train.optim import make_optimizer

    params = {"w": jnp.ones((3, 3))}
    grads = jax.tree.map(jnp.ones_like, params)
    for name in ["sgd", "adam", "adamw", "adadelta", "adamax", "adagrad",
                 "rmsprop", "rprop", "novograd", "adafactor"]:
        opt = make_optimizer(name, lambda i: 1e-3, grad_clip=1.0)
        state = opt.init(params)
        updates, state = opt.update(grads, state, params)
        new_params = optax.apply_updates(params, updates)
        assert jnp.isfinite(new_params["w"]).all(), name
