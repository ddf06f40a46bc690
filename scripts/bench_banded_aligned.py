"""Final banded-flash numbers on LANE-ALIGNED inputs (d1=640, dv=128 —
what the conformer now feeds): fwd and fwd+bwd for the full-T banded
kernel and the manual-DMA streamed kernel, plus unbanded flash, at the
flagship attention shape. Informs docs/PERFORMANCE.md's banded section
and the VMEM-estimate dispatch note.

Run detached: python scripts/bench_banded_aligned.py > /tmp/baligned.log 2>&1 &
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


def fwdbwd_fn(entry_fwd, entry_bwd, lens, wmask, scale, left, right):
    @jax.jit
    def f(qs, ks, v):
        o, lse = entry_fwd(qs, ks, v, lens, 512, 512, scale, False,
                           with_lse=True, left=left, right=right) \
            if entry_fwd is fa._flash_fwd_entry else entry_fwd(
                qs, ks, v, lens, 512, 512, scale, False, True, left, right)
        d = jnp.sum(wmask.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)
        dq, dk, dv_ = entry_bwd(qs, ks, v, wmask, lse, d, lens, 512, 512,
                                scale, False, left=left, right=right) \
            if entry_bwd is fa._flash_bwd_entry else entry_bwd(
                qs, ks, v, wmask, lse, d, lens, 512, 512, scale, False,
                left, right)
        return (jnp.sum(dq.astype(jnp.float32))
                + jnp.sum(dk.astype(jnp.float32))
                + jnp.sum(dv_.astype(jnp.float32)))
    return f


def main():
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    scale = 1.0 / np.sqrt(64.0)
    left = right = 128
    for t in (3072, 6144):
        bh, d1, dv = 64, 640, 128
        rng = np.random.RandomState(0)
        qs = jnp.asarray(rng.randn(bh, t, d1), jnp.bfloat16)
        ks = jnp.asarray(rng.randn(bh, t, d1), jnp.bfloat16)
        v = jnp.asarray(rng.randn(bh, t, dv), jnp.bfloat16)
        lens = jnp.asarray(np.full(bh, t), jnp.int32)
        wmask = jnp.asarray(rng.randn(bh, t, dv), jnp.bfloat16)

        res = {"t": t, "band": [left, right], "aligned": True}
        res["fwd_ms"] = {
            "fullT": timeit(jax.jit(functools.partial(
                fa._flash_fwd_entry, bq=256, bk=512, scale=scale,
                interpret=False, left=left, right=right)), qs, ks, v, lens),
            "stream": timeit(jax.jit(functools.partial(
                fa._flash_fwd_streamed, bq=512, bk=512, scale=scale,
                interpret=False, with_lse=False, left=left, right=right)),
                qs, ks, v, lens),
            "unbanded": timeit(jax.jit(functools.partial(
                fa._flash_fwd_entry, bq=256, bk=512, scale=scale,
                interpret=False)), qs, ks, v, lens),
        }
        res["fwd_bwd_ms"] = {
            "fullT": timeit(fwdbwd_fn(fa._flash_fwd_entry, fa._flash_bwd_entry,
                                      lens, wmask, scale, left, right),
                            qs, ks, v),
            "stream": timeit(fwdbwd_fn(fa._flash_fwd_streamed,
                                       fa._flash_bwd_streamed,
                                       lens, wmask, scale, left, right),
                             qs, ks, v),
        }
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
