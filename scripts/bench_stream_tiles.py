"""Tile-size sweep for the manual-DMA streamed banded flash kernels.

Per-tile costs (DMA issue latency, loop overhead, narrow matmuls) compete
with band over-fetch: larger tiles amortize overhead but process more
out-of-band keys. This sweep finds the production (_STREAM_BQ, _STREAM_BK)
point. Compares against the full-T banded kernel at the same shapes.

Run detached: python scripts/bench_stream_tiles.py > /tmp/btiles.log 2>&1 &
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
import jax.numpy as jnp
import numpy as np

from conformer_nemo_tpu.ops.pallas import flash_attention as fa


def timeit(fn, *args, iters=20, warmup=2):
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
    scale = 1.0 / np.sqrt(64.0)
    left = right = 128
    for t in (3072, 6144):
        bh, d1, dv = 64, 576, 64
        rng = np.random.RandomState(0)
        qs = jnp.asarray(rng.randn(bh, t, d1), jnp.bfloat16)
        ks = jnp.asarray(rng.randn(bh, t, d1), jnp.bfloat16)
        v = jnp.asarray(rng.randn(bh, t, dv), jnp.bfloat16)
        lens = jnp.asarray(np.full(bh, t), jnp.int32)
        wmask = jnp.asarray(rng.randn(bh, t, dv), jnp.bfloat16)

        for bq, bk in [(256, 128), (512, 256), (512, 384), (1024, 256),
                       (512, 128), (512, 512)]:
            fa._STREAM_BQ, fa._STREAM_BK = bq, bk

            fwd = jax.jit(functools.partial(
                fa._flash_fwd_streamed, bq=512, bk=512, scale=scale,
                interpret=False, with_lse=False, left=left, right=right))

            @jax.jit
            def fwdbwd(qs, ks, v):
                o, lse = fa._flash_fwd_streamed(
                    qs, ks, v, lens, 512, 512, scale, False, True, left, right)
                d = jnp.sum(wmask.astype(jnp.float32) * o.astype(jnp.float32),
                            axis=-1, keepdims=True)
                dq, dk, dv_ = fa._flash_bwd_streamed(
                    qs, ks, v, wmask, lse, d, lens, 512, 512, scale, False,
                    left, right)
                return (jnp.sum(dq.astype(jnp.float32))
                        + jnp.sum(dk.astype(jnp.float32))
                        + jnp.sum(dv_.astype(jnp.float32)))

            try:
                res = {"t": t, "bq": bq, "bk": bk,
                       "fwd_ms": timeit(fwd, qs, ks, v, lens),
                       "fwd_bwd_ms": timeit(fwdbwd, qs, ks, v)}
            except Exception as e:  # keep sweeping on a bad combo
                res = {"t": t, "bq": bq, "bk": bk,
                       "error": str(e).splitlines()[0][:160]}
            print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
