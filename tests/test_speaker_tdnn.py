"""ECAPA/TDNN speaker stack + classification losses.

Oracles: torch for the angular/CE losses (reference formula from
angularloss.py:57-69), NumPy for pooling statistics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from conformer_nemo_tpu.models.tdnn import (
    AttentivePool,
    ECAPAEncoder,
    ECAPAEncoderConfig,
    MaskedSEModule,
    SpeakerDecoder,
    SpeakerDecoderConfig,
    StatsPool,
)
from conformer_nemo_tpu.ops.classification_losses import (
    angular_softmax_loss,
    cross_entropy_loss,
    mse_loss,
    top_k_counts,
)


def _init_and_apply(module, rng, *args, train=False):
    variables = module.init(rng, *args, train=train)
    if train:
        out, _ = module.apply(
            variables, *args, train=True, mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        return out
    return module.apply(variables, *args, train=False)


def test_ecapa_encoder_shapes_and_lengths():
    cfg = ECAPAEncoderConfig(
        feat_in=16, filters=(32, 32, 32, 64), kernel_sizes=(5, 3, 3, 1),
        dilations=(1, 2, 3, 1), scale=4, dtype=jnp.float32,
    )
    x = jnp.ones((2, 40, 16))
    lengths = jnp.array([40, 25])
    enc = ECAPAEncoder(cfg)
    (out, out_len) = _init_and_apply(enc, jax.random.PRNGKey(0), x, lengths)
    assert out.shape == (2, 40, 64)
    assert np.asarray(out_len).tolist() == [40, 25]


def test_masked_se_ignores_padding():
    se = MaskedSEModule(8, 6, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x_valid = jax.random.normal(rng, (1, 10, 6))
    lengths = jnp.array([10])
    # same valid content, extra garbage frames past the length
    x_padded = jnp.concatenate(
        [x_valid, 100.0 * jnp.ones((1, 5, 6))], axis=1)
    variables = se.init(rng, x_valid, lengths, train=False)
    out_a = se.apply(variables, x_valid, lengths, train=False)
    out_b = se.apply(variables, x_padded, lengths, train=False)
    np.testing.assert_allclose(
        np.asarray(out_a), np.asarray(out_b[:, :10]), rtol=1e-6)


def test_stats_pool_matches_numpy():
    x = np.random.RandomState(0).randn(3, 20, 5).astype(np.float32)
    pooled = np.asarray(StatsPool("xvector").apply({}, jnp.asarray(x)))
    np.testing.assert_allclose(pooled[:, :5], x.mean(axis=1), rtol=1e-5)
    np.testing.assert_allclose(pooled[:, 5:], x.std(axis=1, ddof=1), rtol=1e-4)
    tap = np.asarray(StatsPool("tap").apply({}, jnp.asarray(x)))
    np.testing.assert_allclose(tap, x.mean(axis=1), rtol=1e-5)


def test_attentive_pool_ignores_padding():
    pool = AttentivePool(attention_channels=8, dtype=jnp.float32)
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (2, 12, 6))
    lengths = jnp.array([12, 7])
    variables = pool.init(rng, x, lengths, train=False)
    out_a = pool.apply(variables, x, lengths, train=False)
    # garbage in the padded region of sample 1 must not change its pooling
    x_garbage = x.at[1, 7:].set(1e3)
    out_b = pool.apply(variables, x_garbage, lengths, train=False)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-5)
    assert out_a.shape == (2, 12)  # [B, 2C]


@pytest.mark.parametrize("pool_mode", ["xvector", "tap", "attention"])
def test_speaker_decoder_shapes(pool_mode):
    cfg = SpeakerDecoderConfig(
        feat_in=16, num_classes=7, emb_sizes=(12,), pool_mode=pool_mode,
        dtype=jnp.float32,
    )
    dec = SpeakerDecoder(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 20, 16))
    lengths = jnp.array([20, 15, 10])
    logits, emb = _init_and_apply(dec, jax.random.PRNGKey(0), x, lengths)
    assert logits.shape == (3, 7)
    assert emb.shape == (3, 12)


def test_speaker_decoder_angular_logits_are_cosines():
    cfg = SpeakerDecoderConfig(
        feat_in=8, num_classes=5, emb_sizes=(6,), pool_mode="xvector",
        angular=True, dtype=jnp.float32,
    )
    dec = SpeakerDecoder(cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 10, 8))
    lengths = jnp.array([10, 10, 10, 10])
    logits, _ = _init_and_apply(dec, jax.random.PRNGKey(0), x, lengths)
    assert np.abs(np.asarray(logits)).max() <= 1.0 + 1e-5


def _torch_angular_loss(logits, labels, scale, margin, eps=1e-7):
    """Literal port of reference angularloss.py:57-69."""
    logits = torch.tensor(logits)
    labels = torch.tensor(labels)
    numerator = scale * torch.cos(
        torch.acos(
            torch.clamp(torch.diagonal(logits.transpose(0, 1)[labels]),
                        -1.0 + eps, 1 - eps)
        ) + margin
    )
    excl = torch.cat(
        [torch.cat((logits[i, :y], logits[i, y + 1:])).unsqueeze(0)
         for i, y in enumerate(labels)], dim=0)
    denominator = torch.exp(numerator) + torch.sum(
        torch.exp(scale * excl), dim=1)
    L = numerator - torch.log(denominator)
    return float(-torch.mean(L))


def test_angular_loss_matches_reference_formula():
    rs = np.random.RandomState(0)
    cosines = np.tanh(rs.randn(6, 9)).astype(np.float32)
    labels = rs.randint(0, 9, size=6)
    ours = float(angular_softmax_loss(
        jnp.asarray(cosines), jnp.asarray(labels), scale=20.0, margin=1.35))
    oracle = _torch_angular_loss(cosines, labels, 20.0, 1.35)
    assert abs(ours - oracle) < 1e-4


def test_cross_entropy_matches_torch():
    rs = np.random.RandomState(1)
    logits = rs.randn(8, 12).astype(np.float32)
    labels = rs.randint(0, 12, size=8)
    ours = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    oracle = float(torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.tensor(labels)))
    assert abs(ours - oracle) < 1e-5


def test_top_k_counts():
    logits = jnp.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1], [0.2, 0.3, 0.5]])
    labels = jnp.array([1, 2, 1])
    correct, total = top_k_counts(logits, labels, top_k=(1, 2))
    assert np.asarray(correct).tolist() == [1, 2]
    assert np.asarray(total).tolist() == [3, 3]
    assert float(mse_loss(jnp.array([1.0, 2.0]), jnp.array([1.0, 4.0]))) == 2.0


def test_speaker_overfit_tiny():
    """End-to-end sanity: ECAPA + decoder + angular loss can fit 2 separable
    'speakers' in a few steps."""
    import optax

    enc_cfg = ECAPAEncoderConfig(
        feat_in=8, filters=(16, 16, 16, 32), kernel_sizes=(5, 3, 3, 1),
        dilations=(1, 1, 1, 1), scale=4, dtype=jnp.float32,
    )
    dec_cfg = SpeakerDecoderConfig(
        feat_in=32, num_classes=2, emb_sizes=(8,), pool_mode="attention",
        angular=True, dtype=jnp.float32,
    )

    class Net(__import__("flax.linen", fromlist=["Module"]).Module):
        def setup(self):
            self.enc = ECAPAEncoder(enc_cfg)
            self.dec = SpeakerDecoder(dec_cfg)

        def __call__(self, x, lengths, *, train):
            h, l = self.enc(x, lengths, train=train)
            return self.dec(h, l, train=train)

    rs = np.random.RandomState(0)
    x = np.zeros((8, 24, 8), np.float32)
    labels = np.arange(8) % 2
    x[labels == 0, :, :4] = rs.rand(4, 24, 4) + 2.0
    x[labels == 1, :, 4:] = rs.rand(4, 24, 4) + 2.0
    x, labels = jnp.asarray(x), jnp.asarray(labels)
    lengths = jnp.full((8,), 24)

    net = Net()
    variables = net.init(jax.random.PRNGKey(0), x, lengths, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            (logits, _), updates = net.apply(
                {"params": p, "batch_stats": batch_stats}, x, lengths,
                train=True, mutable=["batch_stats"])
            return angular_softmax_loss(logits, labels, 20.0, 0.3), updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        update, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, update), updates["batch_stats"], opt_state, loss

    first = None
    for i in range(30):
        params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state)
        if first is None:
            first = float(loss)
    logits, _ = net.apply(
        {"params": params, "batch_stats": batch_stats}, x, lengths, train=False)
    acc = float(jnp.mean(jnp.argmax(logits, -1) == labels))
    assert float(loss) < first
    assert acc == 1.0
