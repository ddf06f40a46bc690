"""Pallas flash attention: interpret-mode parity vs naive attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conformer_nemo_tpu.ops.pallas.flash_attention import flash_attention


def naive_attention(qs, ks, v, lens, scale):
    s = jnp.einsum("btd,bsd->bts", qs, ks).astype(jnp.float32) * scale
    t = qs.shape[1]
    valid = jnp.arange(t)[None, None, :] < lens[:, None, None]
    s = jnp.where(valid, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(valid, p, 0.0)
    return jnp.einsum("bts,bsd->btd", p, v)


@pytest.mark.parametrize("t,d1,dv", [(64, 32, 16), (128, 24, 24)])
def test_flash_matches_naive(t, d1, dv):
    rng = np.random.RandomState(0)
    bh = 4
    qs = jnp.asarray(rng.randn(bh, t, d1).astype(np.float32))
    ks = jnp.asarray(rng.randn(bh, t, d1).astype(np.float32))
    v = jnp.asarray(rng.randn(bh, t, dv).astype(np.float32))
    lens = jnp.array([t, t - 5, t // 2, 3], jnp.int32)
    scale = 1.0 / np.sqrt(d1)

    out = flash_attention(qs, ks, v, lens, 32, 32, scale, True)
    ref = naive_attention(qs, ks, v, lens, scale)
    for b in range(bh):
        l = int(lens[b])
        np.testing.assert_allclose(
            np.asarray(out[b, :l]), np.asarray(ref[b, :l]), rtol=2e-5, atol=2e-5
        )


def test_flash_gradients_match_naive():
    rng = np.random.RandomState(1)
    bh, t, d1, dv = 2, 32, 16, 16
    qs = jnp.asarray(rng.randn(bh, t, d1).astype(np.float32))
    ks = jnp.asarray(rng.randn(bh, t, d1).astype(np.float32))
    v = jnp.asarray(rng.randn(bh, t, dv).astype(np.float32))
    lens = jnp.array([t, t - 7], jnp.int32)
    scale = 0.25
    # weight only valid query rows so garbage rows don't contribute
    wmask = (jnp.arange(t)[None, :] < lens[:, None])[..., None].astype(jnp.float32)

    def loss_flash(qs, ks, v):
        return jnp.sum(flash_attention(qs, ks, v, lens, 16, 16, scale, True) * wmask)

    def loss_naive(qs, ks, v):
        return jnp.sum(naive_attention(qs, ks, v, lens, scale) * wmask)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(qs, ks, v)
    g_naive = jax.grad(loss_naive, argnums=(0, 1, 2))(qs, ks, v)
    for a, b in zip(g_flash, g_naive):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_flash_fully_masked_row():
    # lens = 0 -> output rows must be finite (zeros), not NaN
    qs = jnp.ones((1, 16, 8))
    ks = jnp.ones((1, 16, 8))
    v = jnp.ones((1, 16, 8))
    out = flash_attention(qs, ks, v, jnp.array([0], jnp.int32), 16, 16, 1.0, True)
    assert np.isfinite(np.asarray(out)).all()


def test_auto_flash_threshold_selects_kernel():
    """use_flash_attention='auto' routes through the Pallas kernel only at
    T >= flash_attention_min_t; outputs match the dense path either way."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from conformer_nemo_tpu.models.conformer import (
        ConformerEncoder, ConformerEncoderConfig)

    def run(min_t, t_mel):
        cfg = ConformerEncoderConfig(
            feat_in=16, n_layers=1, d_model=32, n_heads=2,
            ff_expansion_factor=2, conv_kernel_size=7,
            conv_norm_type="layer_norm", dropout=0.0, dropout_att=0.0,
            dtype=jnp.float32, use_flash_attention="auto",
            flash_attention_min_t=min_t)
        enc = ConformerEncoder(cfg)
        rng = np.random.RandomState(0)
        feats = jnp.asarray(rng.randn(2, 16, t_mel).astype(np.float32))
        lens = jnp.asarray([t_mel, t_mel - 40], jnp.int32)
        v = enc.init(jax.random.PRNGKey(0), feats, lens, train=False)
        out, ol = enc.apply(v, feats, lens, train=False)
        return np.asarray(out), np.asarray(ol)

    # below threshold -> dense; above -> flash (interpret mode on CPU).
    dense, l1 = run(min_t=10_000, t_mel=220)
    flash, l2 = run(min_t=8, t_mel=220)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_allclose(dense, flash, rtol=2e-4, atol=2e-5)


def test_flash_fused_bwd_zero_and_short_lengths_no_nan():
    """Fused Pallas bwd: invalid query rows must yield ZERO grads (not NaN
    from exp(s - 0) overflow), including a fully-masked head (len 0)."""
    rng = np.random.RandomState(3)
    bh, t, d1, dv = 3, 64, 16, 16
    qs = jnp.asarray(3.0 * rng.randn(bh, t, d1).astype(np.float32))  # big scores
    ks = jnp.asarray(3.0 * rng.randn(bh, t, d1).astype(np.float32))
    v = jnp.asarray(rng.randn(bh, t, dv).astype(np.float32))
    lens = jnp.array([t, 5, 0], jnp.int32)
    wmask = (jnp.arange(t)[None, :] < lens[:, None])[..., None].astype(np.float32)

    def loss_flash(qs, ks, v):
        return jnp.sum(flash_attention(qs, ks, v, lens, 16, 16, 0.5, True) * wmask)

    def loss_naive(qs, ks, v):
        return jnp.sum(naive_attention(qs, ks, v, lens, 0.5) * wmask)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(qs, ks, v)
    g_naive = jax.grad(loss_naive, argnums=(0, 1, 2))(qs, ks, v)
    for a, b in zip(g_flash, g_naive):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)
    # rows past each head's length must receive exactly zero dQ
    dq = np.asarray(g_flash[0])
    assert np.all(dq[1, 5:] == 0.0) and np.all(dq[2] == 0.0)


@pytest.mark.parametrize("band", [(64, 64), (32, 0), (0, 96), (128, 16)])
@pytest.mark.parametrize("family", ["fullT", "stream"])
def test_banded_flash_matches_dense_banded(band, family, monkeypatch):
    """att_context_size banding folded into the kernel: fwd + all three
    grads match the dense banded reference (query i attends key j iff
    i - j <= left and j - i <= right), including out-of-band tile skipping
    and short lengths. Runs BOTH kernel families (the full-T-block banded
    kernel and, for two-sided bands, the manual-DMA streamed kernel)."""
    from conformer_nemo_tpu.ops.pallas import flash_attention as fa

    left, right = band
    if family == "stream":
        if left < 0 or right < 0:
            pytest.skip("streamed kernels serve two-sided bands only")
        monkeypatch.setattr(fa, "_VMEM_CAP_BYTES", 0)  # force streamed
    else:
        monkeypatch.setattr(fa, "_VMEM_CAP_BYTES", 10**15)  # force full-T
    rng = np.random.RandomState(3)
    bh, t, d1, dv = 3, 256, 32, 16
    qs = jnp.asarray(rng.randn(bh, t, d1), jnp.float32)
    ks = jnp.asarray(rng.randn(bh, t, d1), jnp.float32)
    v = jnp.asarray(rng.randn(bh, t, dv), jnp.float32)
    lens = jnp.asarray([t, t - 70, 19], jnp.int32)
    scale = 0.25
    weight = jnp.asarray(rng.randn(bh, t, dv), jnp.float32)

    def dense(qs, ks, v):
        s = jnp.einsum("bqd,bkd->bqk", qs, ks) * scale
        i = jnp.arange(t)[None, :, None]
        j = jnp.arange(t)[None, None, :]
        mask = j < lens[:, None, None]
        mask = mask & (i - j <= left) & (j - i <= right)
        s = jnp.where(mask, s, -1e30)
        return jax.nn.softmax(s, axis=-1) @ v

    def loss_flash(qs, ks, v):
        o = flash_attention(qs, ks, v, lens, 64, 128, scale, True, left, right)
        row_ok = jnp.arange(t)[None, :, None] < lens[:, None, None]
        return jnp.sum(jnp.where(row_ok, o, 0.0) * weight)

    def loss_dense(qs, ks, v):
        o = dense(qs, ks, v)
        row_ok = jnp.arange(t)[None, :, None] < lens[:, None, None]
        return jnp.sum(jnp.where(row_ok, o, 0.0) * weight)

    val_f, grads_f = jax.value_and_grad(loss_flash, argnums=(0, 1, 2))(qs, ks, v)
    val_d, grads_d = jax.value_and_grad(loss_dense, argnums=(0, 1, 2))(qs, ks, v)
    assert val_f == pytest.approx(val_d, rel=1e-5)
    for a, b, name in zip(grads_f, grads_d, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5, err_msg=name)


def test_banded_flash_unlimited_equals_default():
    rng = np.random.RandomState(5)
    bh, t, d1, dv = 2, 128, 16, 16
    qs = jnp.asarray(rng.randn(bh, t, d1), jnp.float32)
    ks = jnp.asarray(rng.randn(bh, t, d1), jnp.float32)
    v = jnp.asarray(rng.randn(bh, t, dv), jnp.float32)
    lens = jnp.asarray([t, 50], jnp.int32)
    a = flash_attention(qs, ks, v, lens, 64, 64, 1.0, True)
    b = flash_attention(qs, ks, v, lens, 64, 64, 1.0, True, -1, -1)
    c = flash_attention(qs, ks, v, lens, 64, 64, 1.0, True, t, t)  # >= T band
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-6)


def test_streamed_band_tile_table():
    """_stream_table: exact in-band tile ranges — the per-block DMA count is
    set by the band width, independent of T, and every range is in bounds."""
    from conformer_nemo_tpu.ops.pallas import flash_attention as fa

    t, bq, bk, left, right = 1024, 128, 128, 128, 128
    starts, nloc = fa._stream_table(t, bq, bk, left, right)
    assert starts.shape == nloc.shape == (t // bq,)
    assert nloc.max() == 3  # ceil((128+128+128)/128) tiles, NOT t//bk == 8
    assert (starts >= 0).all() and (nloc >= 1).all()
    assert (starts + nloc <= t // bk).all()
    for i in range(t // bq):
        lo = max(0, (i * bq - left) // bk)
        hi = min(t // bk, ((i + 1) * bq - 1 + right) // bk + 1)
        assert starts[i] == lo and starts[i] + nloc[i] == hi
    # doubling T must not change the per-block DMA volume for a fixed band
    _, nloc2 = fa._stream_table(2 * t, bq, bk, left, right)
    assert nloc2.max() == nloc.max()


def test_vmem_estimate_dispatch():
    """Dispatch is a closed-form scoped-VMEM estimate, not a T threshold:
    full-T while the estimate fits the (0.9 x 100 MB) cap, streamed beyond.
    Calibration anchors: 17.33 MB measured at T=2048/d1+dv=640;
    T=12288/d1+dv=768 compiled and ran under the cap on-chip — both must
    dispatch full-T; the 8192-12288 flagship window therefore runs at
    full-T speed (~1.15-1.3x the streamed path, docs/PERFORMANCE.md)."""
    from conformer_nemo_tpu.ops.pallas import flash_attention as fa

    est = fa._fullt_vmem_estimate(2048, 576, 64)
    assert abs(est - 17.33e6) / 17.33e6 < 0.25  # tracks the measurement
    cap = fa._VMEM_SAFETY * fa._VMEM_CAP_BYTES
    assert fa._fullt_vmem_estimate(12288, 640, 128) < cap

    # full-T through the window the streamed path used to (needlessly) own
    for t in (2048, 8192, 10240, 12288):
        assert not fa._is_streamed(128, 128, t, 640, 128), t
    # streamed once the estimate exceeds the cap (T=24576 trains at B=2
    # only because the streamed kernels keep VMEM O(w))
    for t in (16384, 24576):
        assert fa._is_streamed(128, 128, t, 640, 128), t
    # one-sided / unlimited bands never stream
    assert not fa._is_streamed(-1, -1, 32768, 640, 128)
    assert not fa._is_streamed(128, -1, 32768, 640, 128)
    # depth-less fallback keeps the round-4 threshold
    assert not fa._is_streamed(128, 128, 4096)
    assert fa._is_streamed(128, 128, 8192)


def test_two_sided_band_takes_streamed_kernels(monkeypatch):
    """Dispatch guard: a two-sided band whose full-T blocks would exceed
    the scoped-VMEM estimate must use the block-banded streaming kernels
    (O(T*w) DMA + O(w) VMEM), never the full-T-block kernels (whose VMEM
    grows with T)."""
    from conformer_nemo_tpu.ops.pallas import flash_attention as fa

    def boom(*a, **k):
        raise AssertionError("full-T kernel used for a two-sided band")

    monkeypatch.setattr(fa, "_VMEM_CAP_BYTES", 0)  # test-size threshold
    monkeypatch.setattr(fa, "_flash_fwd_entry", boom)
    monkeypatch.setattr(fa, "_flash_bwd_entry", boom)
    rng = np.random.RandomState(7)
    bh, t, d1, dv = 2, 256, 16, 16
    qs = jnp.asarray(rng.randn(bh, t, d1), jnp.float32)
    ks = jnp.asarray(rng.randn(bh, t, d1), jnp.float32)
    v = jnp.asarray(rng.randn(bh, t, dv), jnp.float32)
    lens = jnp.asarray([t, t - 30], jnp.int32)

    def loss(qs, ks, v):
        return jnp.sum(fa.flash_attention(qs, ks, v, lens, 64, 128, 0.3,
                                          True, 48, 16))

    val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(qs, ks, v)
    assert np.isfinite(float(val)) and all(
        np.isfinite(np.asarray(g)).all() for g in grads)
    # unbanded still reaches the full-T kernel
    with pytest.raises(AssertionError, match="full-T"):
        fa.flash_attention(qs, ks, v, lens, 64, 128, 0.3, True)


def test_streamed_band_large_t_parity(monkeypatch):
    """Streamed kernels at T >> band (real tile skipping on both grid
    shapes): fwd + all grads vs dense banded reference."""
    from conformer_nemo_tpu.ops.pallas import flash_attention as fa

    monkeypatch.setattr(fa, "_VMEM_CAP_BYTES", 0)  # force the streamed path
    left, right = 96, 32
    rng = np.random.RandomState(11)
    bh, t, d1, dv = 2, 768, 24, 16
    qs = jnp.asarray(rng.randn(bh, t, d1), jnp.float32)
    ks = jnp.asarray(rng.randn(bh, t, d1), jnp.float32)
    v = jnp.asarray(rng.randn(bh, t, dv), jnp.float32)
    lens = jnp.asarray([t, t - 250], jnp.int32)
    scale = 0.2
    weight = jnp.asarray(rng.randn(bh, t, dv), jnp.float32)
    row_ok = jnp.arange(t)[None, :, None] < lens[:, None, None]

    def dense(qs, ks, v):
        s = jnp.einsum("bqd,bkd->bqk", qs, ks) * scale
        i = jnp.arange(t)[None, :, None]
        j = jnp.arange(t)[None, None, :]
        mask = (j < lens[:, None, None]) & (i - j <= left) & (j - i <= right)
        return jax.nn.softmax(jnp.where(mask, s, -1e30), axis=-1) @ v

    def loss_flash(qs, ks, v):
        o = flash_attention(qs, ks, v, lens, 128, 128, scale, True, left, right)
        return jnp.sum(jnp.where(row_ok, o, 0.0) * weight)

    def loss_dense(qs, ks, v):
        return jnp.sum(jnp.where(row_ok, dense(qs, ks, v), 0.0) * weight)

    val_f, g_f = jax.value_and_grad(loss_flash, argnums=(0, 1, 2))(qs, ks, v)
    val_d, g_d = jax.value_and_grad(loss_dense, argnums=(0, 1, 2))(qs, ks, v)
    assert val_f == pytest.approx(val_d, rel=1e-5)
    for a, b, name in zip(g_f, g_d, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5, err_msg=name)


def test_banded_encoder_flash_matches_dense_path():
    """att_context_size banding no longer forces the dense path: the banded
    flash encoder matches the banded dense encoder (same weights)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from conformer_nemo_tpu.models.conformer import (
        ConformerEncoder, ConformerEncoderConfig)

    def run(min_t, t_mel):
        cfg = ConformerEncoderConfig(
            feat_in=16, n_layers=1, d_model=32, n_heads=2,
            ff_expansion_factor=2, conv_kernel_size=7,
            conv_norm_type="layer_norm", dropout=0.0, dropout_att=0.0,
            dtype=jnp.float32, use_flash_attention="auto",
            flash_attention_min_t=min_t, att_context_size=(12, 4))
        enc = ConformerEncoder(cfg)
        rng = np.random.RandomState(1)
        feats = jnp.asarray(rng.randn(2, 16, t_mel).astype(np.float32))
        lens = jnp.asarray([t_mel, t_mel - 40], jnp.int32)
        v = enc.init(jax.random.PRNGKey(0), feats, lens, train=False)
        out, ol = enc.apply(v, feats, lens, train=False)
        return np.asarray(out), np.asarray(ol)

    dense, l1 = run(min_t=10_000, t_mel=220)   # banded dense path
    flash, l2 = run(min_t=8, t_mel=220)        # banded flash kernel
    np.testing.assert_array_equal(l1, l2)
    for i, L in enumerate(l1):
        np.testing.assert_allclose(flash[i, :, :L], dense[i, :, :L],
                                   rtol=2e-5, atol=2e-5)
