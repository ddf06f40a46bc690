"""Checkpointing: resumable train state + portable inference artifact.

Parity target: the reference's two-tier scheme (SURVEY.md §5.4):
  * PTL `.ckpt` (full trainer state for resume) -> here `step_XXXX/` dirs
    holding the TrainState pytree as flax msgpack, with `last` tracking and
    top-k-on-metric retention (`NeMoModelCheckpoint`, exp_manager.py:665).
  * `.nemo` tar.gz (model_config.yaml + weights + tokenizer artifacts,
    save_restore_connector.py:34-65) -> here a `.cntpu` tar.gz with
    config.yaml + params.msgpack + registered artifact files; written by
    process 0 only.

Multi-process sharded training (dp x tp across hosts): leaves that are not
fully addressable from this process (TP-sharded or globally-replicated
params) are all-gathered to every host via
`multihost_utils.process_allgather` — fine at ASR state sizes (<2 GB fp32
params+optimizer) — then ONLY process 0 writes (the reference's rank-0
discipline, save_restore_connector.py:53), followed by a cross-process
barrier so no rank resumes from a half-written directory. Restore re-shards
each leaf onto the live mesh using the state_template leaf's sharding, so a
restarted dp x tp job gets back exactly the distributed layout it saved
from (tests/test_multiprocess.py::test_two_process_dp_tp_checkpoint_resume).
"""

from __future__ import annotations

import json
import os
import shutil
import tarfile
import tempfile
from typing import Any, Optional

import jax
import numpy as np
import yaml
from flax import serialization


# ---------------------------------------------------------------------------
# Resumable train-state checkpoints
# ---------------------------------------------------------------------------


def _gather_to_host(state):
    """Device->host fetch that also handles NON-fully-addressable arrays.

    Under multi-process sharded training, TP-sharded (and globally
    replicated) params span devices of other processes, so a plain
    `jax.device_get` raises; those leaves are gathered to every host via a
    replicated identity computation (`process_allgather`). Local leaves take
    the cheap `device_get` path.
    """

    def leaf(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(
                multihost_utils.process_allgather(x, tiled=True))
        return jax.device_get(x)

    return jax.tree.map(leaf, state)


def _reshard_like(state_template, state):
    """Put restored host leaves back onto the template's shardings.

    Any template leaf that is a device array spanning >1 device (or devices
    of other processes) is rebuilt with `make_array_from_callback`, which
    only touches the shards addressable from this process — the multi-host
    restore path. Single-device leaves keep the host value (cheap; the next
    jitted step places them).
    """

    def leaf(t, v):
        if isinstance(t, jax.Array):
            sharding = getattr(t, "sharding", None)
            if sharding is not None and (
                not t.is_fully_addressable or len(t.devices()) > 1
            ):
                v_np = np.asarray(v)
                return jax.make_array_from_callback(
                    v_np.shape, sharding, lambda idx, _v=v_np: _v[idx])
        return v

    return jax.tree.map(leaf, state_template, state)


def _barrier(tag: str):
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def _write_train_state(ckpt_dir: str, host_state, step: int,
                       metrics: Optional[dict]) -> str:
    path = os.path.join(ckpt_dir, f"step_{step}")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "state.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(host_state))
    meta = {"step": step, "metrics": metrics or {}}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(ckpt_dir, "last"), "w") as f:
        f.write(f"step_{step}")
    return path


def save_train_state(ckpt_dir: str, state, step: int, metrics: Optional[dict] = None) -> str:
    """Write state pytree -> ckpt_dir/step_{step}/ and update 'last' pointer.

    Collective under multi-process: EVERY process must call this (the
    gather is a replicated computation), only process 0 writes, and all
    processes leave together (barrier)."""
    host_state = _gather_to_host(state)
    path = os.path.join(ckpt_dir, f"step_{step}")
    if jax.process_index() == 0:
        path = _write_train_state(ckpt_dir, host_state, step, metrics)
    _barrier(f"ckpt_save_{step}")
    return path


_SAVE_POOL = None


def _save_pool():
    global _SAVE_POOL
    if _SAVE_POOL is None:
        from concurrent.futures import ThreadPoolExecutor

        # single worker => saves stay ordered; the 'last' pointer is monotone
        _SAVE_POOL = ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="ckpt-save")
    return _SAVE_POOL


def save_train_state_async(ckpt_dir: str, state, step: int,
                           metrics: Optional[dict] = None):
    """Non-blocking checkpoint: the device->host fetch/gather happens NOW
    (the train step donates its state buffers, so they must be copied before
    the next step), serialization + disk I/O run on a background thread (the
    reference's torch `.save` blocks training). Under multi-process this is
    collective like `save_train_state` but does NOT barrier on completion —
    non-zero ranks get an already-resolved Future; call
    `ExpManager.wait_for_saves` (+ the restore-time barrier) before any rank
    may read the directory. Returns a Future resolving to the path."""
    host_state = _gather_to_host(state)
    if jax.process_index() != 0:
        from concurrent.futures import Future

        done: Future = Future()
        done.set_result(os.path.join(ckpt_dir, f"step_{step}"))
        return done
    return _save_pool().submit(_write_train_state, ckpt_dir, host_state,
                               step, metrics)


def restore_train_state(ckpt_dir: str, state_template, step: Optional[int] = None):
    """Restore into the structure AND shardings of `state_template`.
    step=None -> last. Every process reads the (shared-filesystem) file and
    re-shards its own addressable pieces onto the template's mesh layout."""
    _barrier("ckpt_restore")  # no rank reads before the writer is done
    if step is None:
        last = os.path.join(ckpt_dir, "last")
        if not os.path.exists(last):
            return None, None
        with open(last) as f:
            name = f.read().strip()
    else:
        name = f"step_{step}"
    path = os.path.join(ckpt_dir, name)
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        state = serialization.from_bytes(state_template, f.read())
    state = _reshard_like(state_template, state)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return state, meta


def list_checkpoints(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for name in os.listdir(ckpt_dir):
        mpath = os.path.join(ckpt_dir, name, "meta.json")
        if name.startswith("step_") and os.path.exists(mpath):
            with open(mpath) as f:
                out.append((name, json.load(f)))
    return sorted(out, key=lambda x: x[1]["step"])


def prune_checkpoints(
    ckpt_dir: str, save_top_k: int, monitor: str = "val_wer", mode: str = "min"
):
    """Keep top-k by monitored metric + the 'last' checkpoint."""
    ckpts = list_checkpoints(ckpt_dir)
    scored = [
        (name, meta["metrics"].get(monitor))
        for name, meta in ckpts
        if meta["metrics"].get(monitor) is not None
    ]
    reverse = mode == "max"
    scored.sort(key=lambda x: x[1], reverse=reverse)
    keep = {name for name, _ in scored[:save_top_k]}
    last = None
    last_path = os.path.join(ckpt_dir, "last")
    if os.path.exists(last_path):
        with open(last_path) as f:
            last = f.read().strip()
    for name, _meta in ckpts:
        if name not in keep and name != last:
            shutil.rmtree(os.path.join(ckpt_dir, name), ignore_errors=True)


# ---------------------------------------------------------------------------
# Portable artifact (.cntpu — the .nemo analogue)
# ---------------------------------------------------------------------------


def save_portable(
    out_path: str,
    config: dict,
    params: Any,
    artifacts: Optional[dict[str, str]] = None,
) -> None:
    """tar.gz of config.yaml + params.msgpack + artifact files.

    Collective gather; only process 0 writes (rank discipline:
    save_restore_connector.py:53).
    """
    params = _gather_to_host(params)
    if jax.process_index() != 0:
        _barrier("portable_save")
        return
    with tempfile.TemporaryDirectory() as tmp:
        with open(os.path.join(tmp, "model_config.yaml"), "w") as f:
            yaml.safe_dump(config, f)
        with open(os.path.join(tmp, "model_weights.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(params))
        names = {}
        for key, src in (artifacts or {}).items():
            base = os.path.basename(src)
            shutil.copy(src, os.path.join(tmp, base))
            names[key] = base
        with open(os.path.join(tmp, "artifacts.json"), "w") as f:
            json.dump(names, f)
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        with tarfile.open(out_path, "w:gz") as tar:
            for name in os.listdir(tmp):
                tar.add(os.path.join(tmp, name), arcname=name)
    _barrier("portable_save")


def load_portable(path: str, params_template: Any = None, extract_dir: Optional[str] = None):
    """-> (config dict, params pytree, {artifact_key: extracted_path})."""
    tmp = extract_dir or tempfile.mkdtemp(prefix="cntpu_")
    with tarfile.open(path, "r:gz") as tar:
        tar.extractall(tmp, filter="data")
    with open(os.path.join(tmp, "model_config.yaml")) as f:
        config = yaml.safe_load(f)
    with open(os.path.join(tmp, "model_weights.msgpack"), "rb") as f:
        blob = f.read()
    if params_template is not None:
        params = serialization.from_bytes(params_template, blob)
    else:
        params = serialization.msgpack_restore(blob)
    artifacts = {}
    art_json = os.path.join(tmp, "artifacts.json")
    if os.path.exists(art_json):
        with open(art_json) as f:
            names = json.load(f)
        artifacts = {k: os.path.join(tmp, v) for k, v in names.items()}
    return config, params, artifacts
