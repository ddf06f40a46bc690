"""Diagnose the streamed banded flash fixed cost: pad vs kernel vs loop.

Sweep showed streamed fwd time flat across tile sizes and linear in T —
a fixed T-proportional cost. Candidates: (a) the _pad_lane 576->640 /
64->128 materializations; (b) something per-program; (c) the stream loop.
Times: pad alone, kernel on pre-padded inputs (pad cost = 0), a
nearly-empty band (loop cost ~0), and fullT banded on the same padded
shapes (apples-to-apples).

Run detached: python scripts/bench_stream_diag.py > /tmp/bdiag.log 2>&1 &
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
    t, bh = 3072, 64
    rng = np.random.RandomState(0)
    lens = jnp.asarray(np.full(bh, t), jnp.int32)

    # pre-padded shapes: d1=640, dv=128 (lane-aligned; _pad_lane no-ops)
    qsp = jnp.asarray(rng.randn(bh, t, 640), jnp.bfloat16)
    ksp = jnp.asarray(rng.randn(bh, t, 640), jnp.bfloat16)
    vp = jnp.asarray(rng.randn(bh, t, 128), jnp.bfloat16)
    # unpadded shapes (pad happens inside the entry)
    qs = qsp[..., :576]
    ks = ksp[..., :576]
    v = vp[..., :64]

    pad3 = jax.jit(lambda a, b, c: (fa._pad_lane(a), fa._pad_lane(b),
                                    fa._pad_lane(c)))
    out = {"pad_only_ms": timeit(lambda a, b, c: pad3(a, b, c)[0],
                                 qs, ks, v)}

    for name, band in [("band128", (128, 128)), ("band16", (16, 16))]:
        l, r = band
        f_unpadded = jax.jit(functools.partial(
            fa._flash_fwd_streamed, bq=512, bk=512, scale=scale,
            interpret=False, with_lse=False, left=l, right=r))
        f_padded = jax.jit(functools.partial(
            fa._flash_fwd_streamed, bq=512, bk=512, scale=scale,
            interpret=False, with_lse=False, left=l, right=r))
        out[f"{name}_stream_unpadded_ms"] = timeit(f_unpadded, qs, ks, v, lens)
        out[f"{name}_stream_prepadded_ms"] = timeit(f_padded, qsp, ksp, vp, lens)

    fullt_pad = jax.jit(functools.partial(
        fa._flash_fwd_entry, bq=256, bk=512, scale=scale,
        interpret=False, left=128, right=128))
    out["band128_fullT_prepadded_ms"] = timeit(fullt_pad, qsp, ksp, vp, lens)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
