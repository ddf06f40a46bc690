"""REAL multi-process distributed training: 2 OS processes, jax.distributed.

Spawns two workers that each call `jax.distributed.initialize` (CPU backend,
local coordinator), load their own `process_index` manifest shard, assemble
the global batch with `make_array_from_process_local_data`, and run one
sharded train step. Asserts:
  * both ranks compute the SAME loss (it is a replicated global scalar);
  * that loss equals a single-process run over the concatenated shards;
  * the same holds when the mesh combines process-level distribution with
    the tensor-parallel 'model' axis (dp=4 x tp=2 across 2 processes).

Reference analogue: the 2-GPU DDP CI stage (`Jenkinsfile:84-89`) exercising
`nemo/utils/distributed.py:22`; the dp x tp case exceeds the reference's ASR
path (SURVEY.md §2.7 TP row).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from distributed_common import LOCAL_BATCH, build_corpus, load_local_batch, make_tiny_setup

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(tmp_path, manifest, model_axis, mode="step", ckpt_dir=""):
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = ROOT + os.pathsep + os.path.join(ROOT, "tests")
    procs, outs = [], []
    for rank in range(2):
        out = str(tmp_path / f"rank{rank}_tp{model_axis}_{mode}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(ROOT, "tests", "distributed_worker.py"),
             str(rank), "2", str(port), manifest, out, str(model_axis),
             mode, ckpt_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    for p in procs:
        stdout, stderr = p.communicate(timeout=560)
        assert p.returncode == 0, f"worker failed:\n{stdout}\n{stderr}"
    results = []
    for out in outs:
        with open(out) as f:
            results.append(json.load(f))
    return results


def _single_process_reference(manifest):
    """Same global batch on this process's own virtual 8-device dp mesh."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    state, step = make_tiny_setup(mesh)
    shard0 = load_local_batch(manifest, 0, 2)
    shard1 = load_local_batch(manifest, 1, 2)
    # device order in the 2-process mesh: process 0's devices first, so the
    # global batch is [shard0; shard1]
    batch = {k: np.concatenate([shard0[k], shard1[k]]) for k in shard0}
    sh = NamedSharding(mesh, P("data"))
    batch = {k: jax.device_put(v, sh) for k, v in batch.items()}
    state, metrics = step(state, batch)
    return float(metrics["loss"])


def test_two_process_data_parallel(tmp_path):
    manifest = build_corpus(str(tmp_path / "corpus"))
    results = _run_workers(tmp_path, manifest, model_axis=1)

    assert results[0]["devices"] == results[1]["devices"] == 8
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)

    ref_loss = _single_process_reference(manifest)
    assert results[0]["loss"] == pytest.approx(ref_loss, rel=1e-5), (
        f"distributed loss {results[0]['loss']} != single-process {ref_loss}")


def test_two_process_dp_times_tp(tmp_path):
    """2 OS processes x 4 devices arranged dp=4 x tp=2: tensor-parallel
    params sharded ACROSS the process boundary, same loss as pure dp."""
    manifest = build_corpus(str(tmp_path / "corpus"))
    results = _run_workers(tmp_path, manifest, model_axis=2)

    assert results[0]["devices"] == results[1]["devices"] == 8
    assert results[0]["model_axis"] == 2
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)

    # TP must not change the math: compare to the dp-only single-process run
    ref_loss = _single_process_reference(manifest)
    assert results[0]["loss"] == pytest.approx(ref_loss, rel=1e-4), (
        f"dp x tp loss {results[0]['loss']} != dp reference {ref_loss}")


def test_two_process_dp_tp_checkpoint_resume(tmp_path):
    """Checkpointing survives multi-process SHARDED training: train 2 steps
    under dp=4 x tp=2 across 2 OS processes, save (gather-to-host of
    non-addressable TP shards + rank-0 write), kill the processes, start
    FRESH processes that restore onto the live mesh and continue — the
    post-resume loss sequence must equal the uninterrupted run's steps 3-4.

    Reference contract: rank-0 save discipline
    (save_restore_connector.py:53) + exp_manager.py:665 resume.
    """
    manifest = build_corpus(str(tmp_path / "corpus"))
    ckpt_dir = str(tmp_path / "ckpts")
    os.makedirs(ckpt_dir, exist_ok=True)

    full = _run_workers(tmp_path, manifest, model_axis=2,
                        mode="ckpt_train", ckpt_dir=ckpt_dir)
    assert len(full[0]["losses"]) == 4
    assert full[0]["losses"] == pytest.approx(full[1]["losses"], rel=1e-6)
    # only process 0 wrote (rank discipline); the directory is complete
    assert os.path.exists(os.path.join(ckpt_dir, "step_2", "state.msgpack"))
    assert os.path.exists(os.path.join(ckpt_dir, "last"))

    resumed = _run_workers(tmp_path, manifest, model_axis=2,
                           mode="ckpt_resume", ckpt_dir=ckpt_dir)
    assert len(resumed[0]["losses"]) == 2
    assert resumed[0]["losses"] == pytest.approx(resumed[1]["losses"], rel=1e-6)
    # resumed sequence == uninterrupted steps 3-4
    assert resumed[0]["losses"] == pytest.approx(full[0]["losses"][2:], rel=1e-5), (
        f"post-resume {resumed[0]['losses']} != uninterrupted {full[0]['losses'][2:]}")
