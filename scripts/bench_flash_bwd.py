"""Flash-attention fwd+bwd vs dense decomposition on the real chip.

Measures the long-form (T>=1024) training path: full rel-pos attention layer
gradient through the Pallas fused backward vs the dense [T,T] path, at the
encoder's working shape. Prints one JSON line.
"""
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import jax.numpy as jnp

from conformer_nemo_tpu.ops.pallas.flash_attention import flash_attention

B, H, DK, D_MODEL = 16, 8, 64, 512
ITERS = 10


def run(t):
    rng = np.random.RandomState(0)
    bh = B * H
    d1 = DK + D_MODEL  # extended score depth (content + positional fold)
    qs = jnp.asarray(rng.randn(bh, t, d1).astype(np.float32), jnp.bfloat16)
    ks = jnp.asarray(rng.randn(bh, t, d1).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rng.randn(bh, t, DK).astype(np.float32), jnp.bfloat16)
    lens = jnp.full((bh,), t, jnp.int32)
    scale = 1.0 / math.sqrt(DK)

    def loss_flash(qs, ks, v):
        return jnp.sum(flash_attention(qs, ks, v, lens, 256, 512, scale, False).astype(jnp.float32))

    def loss_dense(qs, ks, v):
        s = jnp.einsum("bqd,bkd->bqk", qs.astype(jnp.float32), ks.astype(jnp.float32)) * scale
        mask = jnp.arange(t)[None, None, :] < lens[:, None, None]
        s = jnp.where(mask, s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.sum(jnp.einsum("bqk,bkd->bqd", p.astype(jnp.bfloat16), v).astype(jnp.float32))

    out = {}
    for name, fn in (("flash", loss_flash), ("dense", loss_dense)):
        g = jax.jit(jax.grad(fn, argnums=(0, 1, 2)))
        r = g(qs, ks, v)
        float(jnp.sum(r[0].astype(jnp.float32)))  # sync (tunnel: fetch value)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            r = g(qs, ks, v)
        float(jnp.sum(r[0].astype(jnp.float32)))
        out[name + "_ms"] = round((time.perf_counter() - t0) / ITERS * 1e3, 2)
    out["speedup"] = round(out["dense_ms"] / out["flash_ms"], 2)
    return out


if __name__ == "__main__":
    res = {}
    for t in (1536,):
        res[f"T{t}"] = run(t)
    print(json.dumps(res))
