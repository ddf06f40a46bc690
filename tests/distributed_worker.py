"""Worker process for the real multi-process tests (test_multiprocess.py).

Each OS process: jax.distributed.initialize (CPU backend, local coordinator)
-> 4 virtual devices -> global 8-device mesh -> loads ITS process_index
shard via BucketedLoader -> assembles the global batch -> runs one sharded
CTC train step -> writes the (replicated) loss.

The mesh is ('data', 'model'): with model_axis=1 this is the pure-DP
configuration (the reference's 2-GPU DDP CI job, `/root/reference/
Jenkinsfile:84-89`, `nemo/utils/distributed.py:22`); with model_axis=2 it
combines process-level distribution WITH tensor parallelism (dp=4 x tp=2
across the 2 processes) — params are sharded over 'model' by shard_state and
the step's collectives cross the process boundary.
"""

import json
import os
import sys


def main():
    rank = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = int(sys.argv[3])
    corpus = sys.argv[4]
    outfile = sys.argv[5]
    model_axis = int(sys.argv[6]) if len(sys.argv) > 6 else 1
    mode = sys.argv[7] if len(sys.argv) > 7 else "step"
    ckpt_dir = sys.argv[8] if len(sys.argv) > 8 else ""

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.pop("JAX_PLATFORMS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from conformer_nemo_tpu.parallel.distributed import AppState, initialize_distributed

    pi, pc = initialize_distributed(f"localhost:{port}", nproc, rank)
    assert (pi, pc) == (rank, nproc), (pi, pc)
    app = AppState.current()
    assert app.global_device_count == 4 * nproc

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from distributed_common import LOCAL_BATCH, load_local_batch, make_tiny_setup
    from conformer_nemo_tpu.parallel.mesh import make_mesh

    n_dev = app.global_device_count
    mesh = make_mesh(data=n_dev // model_axis, model=model_axis,
                     devices=jax.devices())
    state, step = make_tiny_setup(mesh)
    if model_axis > 1:
        from conformer_nemo_tpu.parallel.sharding import shard_state

        with mesh:
            state = shard_state(mesh, state)
        # at least one param actually carries the 'model' axis across the
        # process boundary (addressable shards are a strict subset)
        specs = [leaf.sharding.spec for leaf in jax.tree.leaves(state.params)]
        assert any(s and any(s) for s in specs), specs

    local = load_local_batch(corpus, process_index=pi, process_count=pc)
    sh = NamedSharding(mesh, P("data"))
    global_batch = {
        k: jax.make_array_from_process_local_data(sh, v) for k, v in local.items()
    }
    assert global_batch["audio"].shape[0] == LOCAL_BATCH * pc

    if mode == "step":
        state, metrics = step(state, global_batch)
        loss = float(metrics["loss"])
        with open(outfile, "w") as f:
            json.dump({"rank": rank, "loss": loss, "model_axis": model_axis,
                       "devices": app.global_device_count}, f)
        return

    # checkpoint modes: save -> restart (new processes) -> resume must
    # reproduce the uninterrupted loss sequence (VERDICT r3 ask #2; the
    # reference contract is exp_manager.py:665 resume + rank-0 save,
    # save_restore_connector.py:53).
    from conformer_nemo_tpu.train.checkpoint import (
        restore_train_state, save_train_state)

    losses = []
    if mode == "ckpt_train":
        # steps 1-2, save (rank-0 discipline inside save_train_state),
        # then steps 3-4 uninterrupted for the reference sequence
        for _ in range(2):
            state, metrics = step(state, global_batch)
            losses.append(float(metrics["loss"]))
        save_train_state(ckpt_dir, state, step=2)
        for _ in range(2):
            state, metrics = step(state, global_batch)
            losses.append(float(metrics["loss"]))
    elif mode == "ckpt_resume":
        # fresh processes: restore into the SHARDED template and continue
        restored, meta = restore_train_state(ckpt_dir, state)
        assert restored is not None and meta["step"] == 2, meta
        # restored leaves carry the template's (dp x tp) shardings
        import jax as _jax
        for t_leaf, r_leaf in zip(_jax.tree.leaves(state),
                                  _jax.tree.leaves(restored)):
            if isinstance(t_leaf, _jax.Array) and t_leaf.ndim:
                assert isinstance(r_leaf, _jax.Array), type(r_leaf)
                assert r_leaf.sharding.is_equivalent_to(
                    t_leaf.sharding, t_leaf.ndim), (t_leaf.sharding, r_leaf.sharding)
        state = restored
        for _ in range(2):
            state, metrics = step(state, global_batch)
            losses.append(float(metrics["loss"]))
    else:
        raise SystemExit(f"unknown mode {mode}")
    with open(outfile, "w") as f:
        json.dump({"rank": rank, "losses": losses, "model_axis": model_axis,
                   "devices": app.global_device_count}, f)


if __name__ == "__main__":
    main()
