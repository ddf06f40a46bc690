"""On-chip probe for the block-banded STREAMING flash kernels.

Compares, at flagship attention shapes (d1 = dk + d_model = 576, dv = 64,
bh = B*H), three implementations of banded attention:
  stream  — new 3D-grid streaming kernels (O(T*w) DMA + memory)
  fullT   — previous banded kernels (full-T K/V blocks, fori_loop skip)
  dense0  — unbanded flash (upper bound on time)
and checks streamed-vs-fullT parity on-chip (both are exact same math, so
normalized diff should be ~1e-6 f32 / ~1e-2 bf16 rounding).

Run detached (CLAUDE.md): python scripts/bench_banded_stream.py > /tmp/bstream.log 2>&1 &
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

    # f32 parity first: stream and fullT are the same math, so on-chip f32
    # differences beyond ~1e-5 would mean a real kernel bug (bf16 runs
    # below differ by output-rounding, amplified by max/mean normalization).
    t32, l32, r32 = 1024, 96, 64
    rng = np.random.RandomState(1)
    qs = jnp.asarray(rng.randn(8, t32, 576), jnp.float32)
    ks = jnp.asarray(rng.randn(8, t32, 576), jnp.float32)
    v = jnp.asarray(rng.randn(8, t32, 64), jnp.float32)
    lens = jnp.asarray(np.full(8, t32 - 37), jnp.int32)
    o_s = np.asarray(jax.jit(functools.partial(
        fa._flash_fwd_streamed, bq=256, bk=512, scale=scale, interpret=False,
        with_lse=False, left=l32, right=r32))(qs, ks, v, lens))
    o_f = np.asarray(jax.jit(functools.partial(
        fa._flash_fwd_entry, bq=256, bk=512, scale=scale, interpret=False,
        left=l32, right=r32))(qs, ks, v, lens))
    nlen = int(lens[0])
    diff = float(np.abs(o_s[:, :nlen] - o_f[:, :nlen]).max())
    print(json.dumps({"f32_fwd_parity_abs": diff}), flush=True)

    for t, band in [(3072, (128, 128)), (6144, (128, 128)), (3072, (256, 128))]:
        left, right = band
        bh, d1, dv = 64, 576, 64
        rng = np.random.RandomState(0)
        qs = jnp.asarray(rng.randn(bh, t, d1), jnp.bfloat16)
        ks = jnp.asarray(rng.randn(bh, t, d1), jnp.bfloat16)
        v = jnp.asarray(rng.randn(bh, t, dv), jnp.bfloat16)
        lens = jnp.asarray(np.full(bh, t), jnp.int32)
        wmask = jnp.asarray(rng.randn(bh, t, dv), jnp.bfloat16)

        stream_f = jax.jit(functools.partial(
            fa._flash_fwd_streamed, bq=256, bk=512, scale=scale,
            interpret=False, with_lse=False, left=left, right=right))
        fullt_f = jax.jit(functools.partial(
            fa._flash_fwd_entry, bq=256, bk=512, scale=scale,
            interpret=False, left=left, right=right))
        nob_f = jax.jit(functools.partial(
            fa._flash_fwd_entry, bq=256, bk=512, scale=scale,
            interpret=False, left=-1, right=-1))

        # fwd parity stream vs fullT
        o_s = np.asarray(stream_f(qs, ks, v, lens), np.float32)
        o_f = np.asarray(fullt_f(qs, ks, v, lens), np.float32)
        denom = np.abs(o_f).mean() + 1e-6
        fwd_err = float(np.abs(o_s - o_f).max() / denom)

        res = {"t": t, "band": list(band), "fwd_parity_normalized": fwd_err,
               "fwd_ms": {
                   "stream": timeit(stream_f, qs, ks, v, lens),
                   "fullT": timeit(fullt_f, qs, ks, v, lens),
                   "unbanded": timeit(nob_f, qs, ks, v, lens),
               }}

        # fwd+bwd through the public custom_vjp (band -> streamed now)
        def loss_band(qs, ks, v, lv=left, rv=right):
            o = fa.flash_attention(qs, ks, v, lens, 256, 512, scale, False,
                                   lv, rv)
            return jnp.sum((o * wmask).astype(jnp.float32))

        g_stream = jax.jit(jax.value_and_grad(loss_band, argnums=(0, 1, 2)))
        res["fwd_bwd_ms"] = {"stream": timeit(g_stream, qs, ks, v)}

        # old banded path fwd+bwd: the fullT entries have no custom vjp, so
        # time the old fwd + old bwd kernels wired explicitly (same ops the
        # old custom_vjp ran):

        @jax.jit
        def fullt_fwdbwd(qs, ks, v):
            o, lse = fa._flash_fwd_entry(
                qs, ks, v, lens, 256, 512, scale, False, with_lse=True,
                left=left, right=right)
            d = jnp.sum(wmask.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)
            dq, dk, dv_ = fa._flash_bwd_entry(
                qs, ks, v, wmask, lse, d, lens, 256, 512, scale, False,
                left=left, right=right)
            return jnp.sum(dq.astype(jnp.float32)) + jnp.sum(
                dk.astype(jnp.float32)) + jnp.sum(dv_.astype(jnp.float32))

        res["fwd_bwd_ms"]["fullT"] = timeit(fullt_fwdbwd, qs, ks, v)

        # streamed fwd+bwd grad parity vs the old kernels (same wiring)
        @jax.jit
        def stream_fwdbwd_grads(qs, ks, v):
            o, lse = fa._flash_fwd_streamed(
                qs, ks, v, lens, 256, 512, scale, False, True, left, right)
            d = jnp.sum(wmask.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)
            return fa._flash_bwd_streamed(
                qs, ks, v, wmask, lse, d, lens, 256, 512, scale, False,
                left, right)

        @jax.jit
        def fullt_fwdbwd_grads(qs, ks, v):
            o, lse = fa._flash_fwd_entry(
                qs, ks, v, lens, 256, 512, scale, False, with_lse=True,
                left=left, right=right)
            d = jnp.sum(wmask.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)
            return fa._flash_bwd_entry(
                qs, ks, v, wmask, lse, d, lens, 256, 512, scale, False,
                left=left, right=right)

        gs = stream_fwdbwd_grads(qs, ks, v)
        gf = fullt_fwdbwd_grads(qs, ks, v)
        errs = []
        for a, b in zip(gs, gf):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            errs.append(float(np.abs(a - b).max() / (np.abs(b).mean() + 1e-6)))
        res["grad_parity_normalized"] = errs
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
