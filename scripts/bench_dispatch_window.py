"""On-chip check of the round-5 VMEM-estimate banded dispatch.

For two-sided band (128,128) at flagship aligned depths (d1=640, dv=128),
times the full-T banded kernel vs the manual-DMA streamed kernel at T in
the window the estimate reassigns to full-T (8192..12288) plus the first
streamed point (16384): full-T must (a) compile under the 100 MB scoped
VMEM cap and (b) be at least as fast as streamed where the estimate picks
it. Also emits the long-form encoder-forward decode row for
docs/PERFORMANCE.md (T=12288 banded fwd, audio-s/s at the 4x subsampled
frame rate: 1 encoder frame = 40 ms audio).

Run detached (CLAUDE.md): python scripts/bench_dispatch_window.py > /tmp/bdw.log 2>&1 &
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

from conformer_nemo_tpu.ops.pallas import flash_attention as fa


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
        _ = float(jnp.sum(r[0] if isinstance(r, tuple) else r))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _ = float(jnp.sum(r[0] if isinstance(r, tuple) else r))
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    bh, d1, dv = 8, 640, 128
    left = right = 128
    scale = 1.0 / np.sqrt(64.0)
    rng = np.random.RandomState(0)
    for t in (8192, 10240, 12288, 16384):
        qs = jnp.asarray(rng.randn(bh, t, d1), jnp.bfloat16)
        ks = jnp.asarray(rng.randn(bh, t, d1), jnp.bfloat16)
        v = jnp.asarray(rng.randn(bh, t, dv), jnp.bfloat16)
        lens = jnp.asarray(np.full(bh, t), jnp.int32)
        est = fa._fullt_vmem_estimate(t, d1, dv)
        pick = "stream" if fa._is_streamed(left, right, t, d1, dv) else "fullT"
        row = {"t": t, "est_mb": round(est / 1e6, 1), "dispatch": pick}
        try:
            full = jax.jit(functools.partial(
                fa._flash_fwd_entry, bq=256, bk=512, scale=scale,
                interpret=False, with_lse=False, left=left, right=right))
            row["fullT_ms"] = round(timeit(full, qs, ks, v, lens), 2)
        except Exception as e:  # noqa: BLE001 — report compile failures
            row["fullT_ms"] = f"error: {type(e).__name__}: {str(e)[:120]}"
        stream = jax.jit(functools.partial(
            fa._flash_fwd_streamed, bq=256, bk=512, scale=scale,
            interpret=False, with_lse=False, left=left, right=right))
        row["stream_ms"] = round(timeit(stream, qs, ks, v, lens), 2)
        if isinstance(row["fullT_ms"], float):
            # long-form decode row: audio seconds per wall second for this
            # single-layer attention fwd is not meaningful alone; report the
            # kernel ratio and leave the encoder-level number to the
            # encoder bench below.
            row["fullT_over_stream"] = round(
                row["fullT_ms"] / row["stream_ms"], 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
