"""Worker process for the real multi-process test (test_multiprocess.py).

Each OS process: jax.distributed.initialize (CPU backend, local coordinator)
-> 4 virtual devices -> global 8-device 'data' mesh -> loads ITS
process_index shard via BucketedLoader -> assembles the global batch ->
runs one sharded CTC train step -> writes the (replicated) loss.

Mirrors the reference's 2-GPU DDP CI job (`/root/reference/Jenkinsfile:84-89`,
`nemo/utils/distributed.py:22`).
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
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from distributed_common import LOCAL_BATCH, load_local_batch, make_tiny_setup

    mesh = Mesh(np.array(jax.devices()), ("data",))
    state, step = make_tiny_setup(mesh)

    local = load_local_batch(corpus, process_index=pi, process_count=pc)
    sh = NamedSharding(mesh, P("data"))
    global_batch = {
        k: jax.make_array_from_process_local_data(sh, v) for k, v in local.items()
    }
    assert global_batch["audio"].shape[0] == LOCAL_BATCH * pc

    state, metrics = step(state, global_batch)
    loss = float(metrics["loss"])
    with open(outfile, "w") as f:
        json.dump({"rank": rank, "loss": loss,
                   "devices": app.global_device_count}, f)


if __name__ == "__main__":
    main()
