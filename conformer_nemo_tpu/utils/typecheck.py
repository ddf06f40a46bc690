"""Trace-time tensor contracts — the reference's typecheck/NeuralType analogue.

The reference attaches `NeuralType` axis tuples to every NeuralModule and
validates them on each call (`nemo/core/classes/common.py:795` `typecheck`,
`nemo/core/neural_types/neural_type.py`): axis kinds ('B','T','D'...) and
semantic element types are checked between producer and consumer modules.

TPU-native twist: under `jax.jit` every array has a static shape at trace
time, so the same contracts are enforceable *while tracing* — rank, axis-
letter consistency (the same letter must bind the same extent across all
arguments), and dtype class — at zero device cost. Outside jit the checks
run on concrete shapes, equally free.

Usage::

    @typecheck(audio=("B", "T"), lengths=("B",), outputs=(("B", "D", "F"), ("B",)))
    def log_mel(audio, lengths): ...

Axis spec entries:
  - a string letter ("B", "T", ...): binds an extent; every use of the same
    letter within one call must match.
  - an int: exact required extent.
  - None: any extent (unconstrained).
A trailing dtype entry is allowed via `dtype=` in `Spec`.
"""

from __future__ import annotations

import dataclasses
import functools
import inspect
from typing import Any, Optional, Sequence

__all__ = ["Spec", "typecheck", "check_shapes", "TypecheckError"]


class TypecheckError(TypeError):
    """Raised when a tensor fails its declared axis contract."""


@dataclasses.dataclass(frozen=True)
class Spec:
    """Axis contract for one tensor: `Spec(('B','T'), dtype=jnp.floating)`.

    `dtype` may be a dtype, a dtype class (e.g. `jnp.floating`,
    `jnp.integer`), or None (unchecked). Mirrors the role of the reference's
    `NeuralType(axes, element_type)` without the semantic-tag hierarchy — the
    semantic tags live in docstrings; the machine-checkable part (axes,
    dtype kind) is enforced.
    """

    axes: tuple
    dtype: Any = None


def _as_spec(s) -> Optional[Spec]:
    if s is None:
        return None
    if isinstance(s, Spec):
        return s
    return Spec(tuple(s))


def _check_one(name: str, value, spec: Spec, env: dict) -> None:
    shape = getattr(value, "shape", None)
    if shape is None:
        raise TypecheckError(f"{name}: expected an array with axes {spec.axes}, got {type(value)}")
    if len(shape) != len(spec.axes):
        raise TypecheckError(
            f"{name}: rank {len(shape)} (shape {tuple(shape)}) does not match axes {spec.axes}")
    for dim, ax in zip(shape, spec.axes):
        if ax is None:
            continue
        if isinstance(ax, int):
            if dim != ax:
                raise TypecheckError(
                    f"{name}: axis with fixed extent {ax} has extent {dim} (shape {tuple(shape)})")
            continue
        bound = env.setdefault(ax, (dim, name))
        if bound[0] != dim:
            raise TypecheckError(
                f"{name}: axis '{ax}' has extent {dim} but was bound to {bound[0]} by {bound[1]!r}")
    if spec.dtype is not None:
        import jax.numpy as jnp
        import numpy as np

        dt = np.dtype(getattr(value, "dtype", None))
        ok = (
            np.issubdtype(dt, spec.dtype)
            if inspect.isclass(spec.dtype) or isinstance(spec.dtype, type(np.floating))
            else dt == np.dtype(spec.dtype)
        )
        del jnp
        if not ok:
            raise TypecheckError(f"{name}: dtype {dt} does not satisfy {spec.dtype}")


def check_shapes(env: Optional[dict] = None, **named) -> dict:
    """Imperative form: `check_shapes(audio=(wav, ('B','T')), lens=(lengths, ('B',)))`.

    Returns the axis-binding environment so chained calls can share letters.
    """
    env = env if env is not None else {}
    for name, (value, spec) in named.items():
        _check_one(name, value, _as_spec(spec), env)
    return env


def typecheck(outputs=None, **arg_specs):
    """Decorator enforcing axis contracts on named args and (optionally) outputs.

    `outputs` is a single axis tuple/Spec or a tuple of them matching the
    returned tuple. Checks run at trace time under jit (static shapes) and on
    concrete values elsewhere; either way no device computation is added.
    """
    out_specs: Optional[Sequence] = None
    if outputs is not None:
        if isinstance(outputs, Spec) or (
            isinstance(outputs, (tuple, list)) and outputs and isinstance(outputs[0], (str, int, type(None)))
        ):
            out_specs = (outputs,)
        else:
            out_specs = tuple(outputs)

    def deco(fn):
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            bound = sig.bind(*args, **kwargs)
            env: dict = {}
            for name, spec in arg_specs.items():
                if name in bound.arguments and bound.arguments[name] is not None:
                    _check_one(name, bound.arguments[name], _as_spec(spec), env)
            result = fn(*args, **kwargs)
            if out_specs is not None:
                outs = result if isinstance(result, tuple) else (result,)
                for i, (value, spec) in enumerate(zip(outs, out_specs)):
                    if spec is not None:
                        _check_one(f"output[{i}]", value, _as_spec(spec), env)
            return result

        return wrapped

    return deco
