"""Flash vs dense attention: peak HBM + step time of full-encoder training.

Measures the VERDICT round-2 ask: the flash path's memory claim ("no
[B,H,T,T] materialization raises max trainable T") as numbers, not an
assertion. Runs the flagship 18-layer d512 bf16 encoder fwd+bwd (grads wrt
params) at long-form encoder lengths with the attention path forced to
flash or dense, and reads the built executable's `memory_analysis()`
(device `memory_stats()` is unavailable through the tunneled runtime).

One (mode, t_enc, batch) config per process invocation (`--one mode t b`):
a RESOURCE_EXHAUSTED config then crashes ITS process only, and the
orchestrator records "OOM" and cools down before the next connection
(CLAUDE.md tunnel discipline). Results print as one JSON line.

Usage:
  python scripts/bench_flash_memory.py            # full matrix, subprocesses
  python scripts/bench_flash_memory.py --one flash 1536 8
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 5
# (t_enc, batch): encoder frames after 4x subsampling; t_mel = 4*t_enc.
# dense materializes f32 [B,H,T,T] score temporaries per layer in the
# backward (2.25 GB each at T=3072/B=8), so its trainable-T ceiling is
# far below flash's.
# "+r" = per-layer remat (cfg.remat): the long-form recipe is flash + remat
MATRIX = [
    ("dense", 1536, 8), ("flash", 1536, 8),
    ("dense", 2048, 8), ("flash", 2048, 8),
    ("flash+r", 2048, 8), ("dense+r", 2048, 8),
    ("flash+r", 3072, 8), ("dense+r", 3072, 8),
    ("flash+r", 6144, 8), ("dense+r", 6144, 8),
    # banded (att_context_size (128,128) -> block-banded STREAMING kernels):
    # time and memory scale with the band width w, not T — the ceiling rows
    # below are unreachable for unbanded flash (its full-T VMEM blocks blow
    # the 100 MB scoped budget past T~10k; see flash_attention.py).
    ("band+r", 6144, 8), ("flash+r", 12288, 8),
    ("band+r", 12288, 8), ("band+r", 24576, 8),
]
# resume support: skip keys already recorded in FLASHMEM_SKIP (comma list)


def run_one(mode: str, t_enc: int, b: int) -> dict:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    import jax.numpy as jnp

    from conformer_nemo_tpu.models.conformer import (
        ConformerEncoder, ConformerEncoderConfig)

    n_layers = int(os.environ.get("FLASHMEM_LAYERS", "18"))
    banded = mode.startswith("band")
    cfg = ConformerEncoderConfig(
        feat_in=80, n_layers=n_layers, d_model=512, n_heads=8,
        conv_norm_type="layer_norm",  # BN stats are irrelevant to the memory story
        dropout=0.0, dropout_att=0.0, dropout_emb=0.0,
        dtype=jnp.bfloat16,
        use_flash_attention=mode.startswith("flash") or banded,
        remat=mode.endswith("+r"),
        att_context_size=(128, 128) if banded else (-1, -1),
    )
    model = ConformerEncoder(cfg)
    t_mel = 4 * t_enc
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(b, 80, t_mel).astype(np.float32))
    lens = jnp.full((b,), t_mel, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), feats[:1], lens[:1], train=False)

    def loss(params, feats, lens):
        out, _ = model.apply({"params": params}, feats, lens, train=True,
                             rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.sum(out.astype(jnp.float32))

    g = jax.jit(jax.grad(loss))
    out = {}
    # compile first: an over-HBM program fails HERE with the compiler's
    # "Used X of Y hbm" accounting (memory_stats() is unavailable through
    # the tunneled runtime; memory_analysis() of the built executable is)
    compiled = g.lower(variables["params"], feats, lens).compile()
    try:
        ma = compiled.memory_analysis()
        out["temp_gb"] = round(ma.temp_size_in_bytes / 2**30, 2)
        out["args_out_gb"] = round(
            (ma.argument_size_in_bytes + ma.output_size_in_bytes
             - ma.alias_size_in_bytes) / 2**30, 2)
    except Exception:
        pass
    # execute through the compiled executable directly (a fresh g(...) call
    # would re-dispatch through jit and pay a second compile/load)
    grads = compiled(variables["params"], feats, lens)
    first = jax.tree.leaves(grads)[0]
    float(jnp.sum(first.astype(jnp.float32)))  # sync: fetch value (tunnel)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        grads = compiled(variables["params"], feats, lens)
    float(jnp.sum(jax.tree.leaves(grads)[0].astype(jnp.float32)))
    out["step_ms"] = round((time.perf_counter() - t0) / ITERS * 1e3, 1)
    return out


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        print(json.dumps(run_one(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))),
              flush=True)
        return
    res = {}
    first = True
    prev_failed = False
    skip = set(os.environ.get("FLASHMEM_SKIP", "").split(","))
    for mode, t, b in MATRIX:
        if f"{mode}_T{t}_B{b}" in skip:
            continue
        if not first:
            time.sleep(600 if prev_failed else 90)  # tunnel backend cooldown
        first = False
        key = f"{mode}_T{t}_B{b}"
        print(f"[flashmem] {key} ...", file=sys.stderr)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", mode, str(t), str(b)],
            capture_output=True, text=True)
        line = next((ln for ln in reversed(r.stdout.splitlines())
                     if ln.startswith("{")), None)
        if r.returncode == 0 and line:
            res[key] = json.loads(line)
            prev_failed = False
        else:
            err = r.stderr or ""
            tail = err.strip().splitlines()[-1:] or ["?"]
            if "RESOURCE_EXHAUSTED" in err or "Ran out of memory" in err:
                import re

                m = re.search(r"Used ([0-9.]+[GMK]) of ([0-9.]+[GMK]) hbm", err)
                res[key] = f"OOM ({m.group(1)} needed, {m.group(2)} HBM)" if m else "OOM"
            else:
                res[key] = f"error: {tail[0][:160]}"
            prev_failed = True
        print(json.dumps(res), flush=True)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
