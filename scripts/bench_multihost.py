"""Multi-host training-throughput benchmark (the >=80%-scaling evidence path).

BASELINE.md targets >=80% scaling efficiency at >=2 hosts; this script is the
ready-to-run measurement channel for the day multi-host hardware exists, and
doubles as a CPU-mesh contract test today (tests/test_bench_multihost.py runs
it with --dryrun on every CI pass). Reference analogue: the multi-GPU DDP
throughput the reference's CI stages exercise (`/root/reference/
Jenkinsfile:84-89`) on top of `nemo/utils/distributed.py:22`.

Modes:
  * Launcher (default): `python scripts/bench_multihost.py --nproc 2`
    spawns N single-host worker processes of this same script against a
    local coordinator (virtual CPU devices), plus a 1-process baseline, and
    prints ONE JSON line with per-chip throughput and scaling efficiency.
  * Worker: `python scripts/bench_multihost.py --rank I --nproc N
    --coordinator HOST:PORT` — run exactly this on EACH host of a real pod
    (no other changes); rank 0 prints the JSON. On TPU hosts leave
    --devices-per-proc unset to use the real local chips.

Measurement: data-parallel CTC training (the framework's real train step +
mesh/sharding path — make_ctc_train_step over a 'data' x 'model' mesh, global
batch assembled with make_array_from_process_local_data), fixed
device-resident batch per step so the number isolates step+collective time
(the host loader has its own bench section). Efficiency is
(rate_N / N) / rate_1 with identical per-process work.
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SR = 16000


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def worker(args) -> dict:
    """One process of the (possibly multi-host) job. Returns rank-0 metrics."""
    if args.devices_per_proc:
        os.environ["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={args.devices_per_proc}")
        os.environ.pop("JAX_PLATFORMS", None)
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from conformer_nemo_tpu.audio.features import MelFeatureConfig
    from conformer_nemo_tpu.models.conformer import ConformerEncoderConfig
    from conformer_nemo_tpu.models.ctc_model import CTCModelConfig
    from conformer_nemo_tpu.parallel.distributed import initialize_distributed
    from conformer_nemo_tpu.parallel.mesh import make_mesh
    from conformer_nemo_tpu.train.lr_schedule import make_lr_schedule
    from conformer_nemo_tpu.train.optim import make_optimizer
    from conformer_nemo_tpu.train.trainer import init_ctc_state, make_ctc_train_step

    if args.nproc > 1:
        initialize_distributed(args.coordinator, args.nproc, args.rank)

    import jax.numpy as jnp

    if args.dryrun:
        feat, layers, d_model, heads = 16, 1, 32, 2
        local_b, seconds, steps, warmup = 2, 0.5, 3, 1
        dtype = jnp.float32
    else:
        feat, layers, d_model, heads = 80, 18, 512, 8
        local_b, seconds, steps, warmup = 16, 15.0, 20, 3
        dtype = jnp.bfloat16

    enc = ConformerEncoderConfig(
        feat_in=feat, n_layers=layers, d_model=d_model, n_heads=heads,
        dtype=dtype, dropout=0.0, dropout_att=0.0)
    cfg = CTCModelConfig(
        preprocessor=MelFeatureConfig(features=feat, dither=0.0),
        encoder=enc, num_classes=128)
    sched = make_lr_schedule(
        {"name": "NoamAnnealing", "d_model": d_model, "warmup_steps": 10000}, 2.0)
    opt = make_optimizer("adamw", sched, weight_decay=1e-3, grad_clip=1.0)

    n_dev = jax.device_count()
    mesh = make_mesh(data=n_dev, model=1, devices=jax.devices())
    rep = NamedSharding(mesh, P())
    state = jax.jit(
        lambda key: init_ctc_state(cfg, opt, key, (1, feat, 16)),
        out_shardings=rep,
    )(jax.random.PRNGKey(0))
    step = make_ctc_train_step(cfg, opt, mesh=mesh, state_template=state)

    t_samples = int(seconds * SR)
    rng = np.random.RandomState(args.rank)
    local = {
        "audio": (rng.randn(local_b, t_samples) * 0.1).astype(np.float32),
        "audio_lens": np.full((local_b,), t_samples, np.int32),
        "tokens": rng.randint(0, 128, size=(local_b, 16)).astype(np.int32),
        "token_lens": np.full((local_b,), 16, np.int32),
    }
    sh = NamedSharding(mesh, P("data"))
    batch = {k: jax.make_array_from_process_local_data(sh, v)
             for k, v in local.items()}
    global_b = local_b * args.nproc

    for _ in range(warmup):
        state, metrics = step(state, batch)
    float(metrics["loss"])  # sync (see CLAUDE.md: value fetch, not
    # block_until_ready, forces execution through a tunneled runtime)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    audio_s_per_s = global_b * seconds * steps / dt
    return {
        "nproc": args.nproc,
        "devices": n_dev,
        "global_batch": global_b,
        "audio_s_per_s": round(audio_s_per_s, 2),
        "audio_s_per_s_per_proc": round(audio_s_per_s / args.nproc, 2),
        "step_ms": round(dt / steps * 1e3, 2),
    }


def launch(args) -> dict:
    """Spawn an N-process local job + a 1-process baseline; compute
    efficiency. The same worker code runs unchanged on a real pod."""

    def run_job(nproc):
        port = _free_port()
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        env["PYTHONPATH"] = ROOT
        procs = []
        outs = [os.path.join(args.tmpdir, f"mh_{nproc}_{r}.json")
                for r in range(nproc)]
        for r in range(nproc):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--rank", str(r), "--nproc", str(nproc),
                   "--coordinator", f"localhost:{port}",
                   "--devices-per-proc", str(args.devices_per_proc or 2),
                   "--out", outs[r]]
            if args.dryrun:
                cmd.append("--dryrun")
            procs.append(subprocess.Popen(
                cmd, env=env, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True))
        for p in procs:
            stdout, stderr = p.communicate(timeout=args.timeout)
            if p.returncode != 0:
                raise RuntimeError(
                    f"worker failed (nproc={nproc}):\n{stdout}\n{stderr}")
        with open(outs[0]) as f:
            return json.load(f)

    base = run_job(1)
    multi = run_job(args.nproc)
    eff = (multi["audio_s_per_s"] / args.nproc) / max(base["audio_s_per_s"], 1e-9)
    return {
        "baseline_1proc": base,
        f"{args.nproc}proc": multi,
        "scaling_efficiency": round(eff, 3),
        "note": ("CPU-mesh contract run; on real hosts run the worker mode "
                 "on each host — BASELINE.md targets >=0.8 at >=2 hosts"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--rank", type=int, default=None,
                    help="worker mode: this process's rank")
    ap.add_argument("--coordinator", default=None, help="host:port")
    ap.add_argument("--devices-per-proc", type=int, default=0,
                    help="force N virtual CPU devices (0 = real local devices)")
    ap.add_argument("--dryrun", action="store_true",
                    help="tiny model + 3 steps (CI contract run)")
    ap.add_argument("--out", default=None, help="worker: write JSON here")
    ap.add_argument("--tmpdir", default="/tmp")
    ap.add_argument("--timeout", type=float, default=560.0)
    args = ap.parse_args()

    if args.rank is not None:
        res = worker(args)
        if args.out:
            with open(args.out, "w") as f:
                json.dump(res, f)
        if args.rank == 0:
            print(json.dumps(res), flush=True)
        return

    print(json.dumps(launch(args)), flush=True)


if __name__ == "__main__":
    main()
