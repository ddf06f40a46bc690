"""SSL stack: reconstruction decoder, Gumbel VQ, contrastive loss, e2e fit.

Oracles: reference math ported to NumPy/torch where closed-form (perplexity
regularizer, cosine CE); loss-decreases + encoder-transfer for the e2e path.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from conformer_nemo_tpu.models.ssl import (
    GumbelVQConfig,
    GumbelVectorQuantizer,
    ReconstructionDecoder,
    ReconstructionDecoderConfig,
    gumbel_temperature,
)
from conformer_nemo_tpu.ops.contrastive_loss import (
    ContrastiveLoss,
    ContrastiveLossConfig,
)


def test_reconstruction_decoder_upsamples():
    cfg = ReconstructionDecoderConfig(
        feat_in=32, feat_out=20, feat_hidden=16, stride_layers=2,
        non_stride_layers=1, kernel_size=5, dtype=jnp.float32)
    dec = ReconstructionDecoder(cfg)
    x = jnp.ones((2, 10, 32))
    variables = dec.init(jax.random.PRNGKey(0), x, train=False)
    out = dec.apply(variables, x, train=False)
    assert out.shape == (2, 40, 20)  # 2 stride layers -> 4x upsample


def test_gumbel_vq_shapes_and_ppl():
    cfg = GumbelVQConfig(dim=24, num_vars=16, groups=2, combine_groups=True,
                         vq_dim=8)
    vq = GumbelVectorQuantizer(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 24))
    variables = vq.init(jax.random.PRNGKey(1), x, 2.0, train=False)
    q, ppl = vq.apply(variables, x, 2.0, train=False)
    assert q.shape == (2, 6, 8)
    # eval quantization: every step's vector is a concat of codebook rows
    cb = np.asarray(variables["params"]["vars"])  # [V, 4]
    qn = np.asarray(q).reshape(-1, 2, 4)
    for g in range(2):
        dists = np.abs(qn[:, g, None, :] - cb[None, :, :]).sum(-1).min(axis=1)
        assert dists.max() < 1e-5
    # ppl regularizer in [0, 1): 0 when all codewords equally used
    assert 0.0 <= float(ppl) < 1.0
    # train mode is straight-through: output within codebook convex hull and
    # gradients flow to the projection
    def f(xx):
        q2, _ = vq.apply(variables, xx, 10.0, train=True,
                         rng=jax.random.PRNGKey(3))
        return jnp.sum(q2 ** 2)
    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0


def test_gumbel_temperature_decay():
    cfg = GumbelVQConfig(temp_start=2.0, temp_min=0.5, temp_decay=0.9)
    assert float(gumbel_temperature(cfg, 0)) == 2.0
    assert abs(float(gumbel_temperature(cfg, 1)) - 1.8) < 1e-6
    assert float(gumbel_temperature(cfg, 1000)) == 0.5


def _mk_loss_inputs(b=2, d=8, t=24, k=4, proj=6, seed=0):
    rs = np.random.RandomState(seed)
    spec = rs.randn(b, d, t).astype(np.float32)
    # mask two whole 4-frame patches per sample
    spec_masks = np.zeros((b, d, t), np.float32)
    masked = spec.copy()
    for i in range(b):
        for p in (0, 3):
            spec_masks[i, :, p * k : (p + 1) * k] = 1.0
            masked[i, :, p * k : (p + 1) * k] = 0.0
    outputs = rs.randn(b, t // k, proj).astype(np.float32)
    return spec, spec_masks, outputs


def test_contrastive_loss_identifies_positive():
    """When decoder outputs EQUAL the projected targets, the loss must be far
    lower than for random outputs (the CE prefers the positive)."""
    cfg = ContrastiveLossConfig(
        in_dim=8, proj_dim=6, combine_time_steps=4, num_negatives=3,
        quantized_targets=False, logit_temp=0.1, reduce="mean")
    loss_mod = ContrastiveLoss(cfg)
    spec, spec_masks, outputs = _mk_loss_inputs()
    rng = jax.random.PRNGKey(0)
    variables = loss_mod.init(
        rng, jnp.asarray(spec), jnp.asarray(spec_masks), jnp.asarray(outputs),
        step=0, rng=rng, train=True)

    # compute the projected targets with the initialized params
    w = np.asarray(variables["params"]["target_proj"]["kernel"])
    bias = np.asarray(variables["params"]["target_proj"]["bias"])
    tgt = spec.transpose(0, 2, 1).reshape(2, 6, 32) @ w + bias

    loss_perfect = float(loss_mod.apply(
        variables, jnp.asarray(spec), jnp.asarray(spec_masks),
        jnp.asarray(tgt), step=0, rng=rng, train=True))
    loss_random = float(loss_mod.apply(
        variables, jnp.asarray(spec), jnp.asarray(spec_masks),
        jnp.asarray(outputs), step=0, rng=rng, train=True))
    assert loss_perfect < loss_random
    assert loss_perfect < 0.1  # cos=1 vs negatives at temp 0.1


def test_contrastive_loss_quantized_and_grads():
    cfg = ContrastiveLossConfig(
        in_dim=8, proj_dim=6, combine_time_steps=4, num_negatives=3,
        quantized_targets=True, codebook_size=12, num_groups=2,
        prob_ppl_weight=0.1, reduce="sum")
    loss_mod = ContrastiveLoss(cfg)
    spec, spec_masks, outputs = _mk_loss_inputs()
    rng = jax.random.PRNGKey(1)
    variables = loss_mod.init(
        rng, jnp.asarray(spec), jnp.asarray(spec_masks), jnp.asarray(outputs),
        step=0, rng=rng, train=True)

    def f(params, outs):
        return loss_mod.apply(
            {"params": params}, jnp.asarray(spec), jnp.asarray(spec_masks),
            outs, step=100, rng=rng, train=True)

    loss, grads = jax.value_and_grad(f, argnums=(0, 1))(
        variables["params"], jnp.asarray(outputs))
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(grads[0])
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # codebook + quantizer projection receive gradient (straight-through)
    gv = np.abs(np.asarray(grads[0]["quantizer"]["vars"])).sum()
    assert gv > 0
    assert np.abs(np.asarray(grads[1])).sum() > 0


def test_ssl_model_e2e_and_transfer(tmp_path):
    """Fit a tiny SSL model on synthetic audio; loss decreases; encoder
    transfers into a ConformerCTC of matching config."""
    from conformer_nemo_tpu.api_ssl import SpeechSSLModel
    from conformer_nemo_tpu.audio.features import MelFeatureConfig
    from conformer_nemo_tpu.data.audio_io import write_wav
    from conformer_nemo_tpu.models.conformer import ConformerEncoderConfig

    sr = 16000
    rows = []
    rs = np.random.RandomState(0)
    for i in range(4):
        dur = 0.5 + 0.1 * i
        t = np.arange(int(dur * sr)) / sr
        sig = (0.3 * np.sin(2 * np.pi * (200 + 50 * i) * t)
               + 0.02 * rs.randn(len(t))).astype(np.float32)
        p = str(tmp_path / f"u{i}.wav")
        write_wav(p, sig, sr)
        rows.append({"audio_filepath": p, "duration": dur, "text": ""})
    manifest = str(tmp_path / "m.json")
    with open(manifest, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    enc = ConformerEncoderConfig(
        feat_in=32, n_layers=2, d_model=32, n_heads=4,
        subsampling_factor=4, conv_norm_type="layer_norm",
        dtype=jnp.float32)
    model = SpeechSSLModel(
        encoder=enc, mel=MelFeatureConfig(features=32),
        loss=ContrastiveLossConfig(
            in_dim=32, proj_dim=16, combine_time_steps=4, num_negatives=4,
            quantized_targets=False, reduce="mean"),
        patch_size=4, mask_patches=4,
    )
    out = model.fit(manifest, max_steps=30, batch_size=4, lr=2e-3,
                    log_every_n_steps=5)
    losses = [h["loss"] for h in out["history"]]
    assert losses[-1] < losses[0]

    # portable roundtrip
    ckpt = str(tmp_path / "ssl.cntpu")
    model.save_portable(ckpt)
    model2 = SpeechSSLModel(
        encoder=enc, mel=MelFeatureConfig(features=32),
        loss=model.loss_cfg, patch_size=4, mask_patches=4)
    model2.restore_weights(ckpt)
    enc_a = jnp.concatenate([x.ravel() for x in
                             jax.tree.leaves(model.state.params["encoder"])])
    enc_b = jnp.concatenate([x.ravel() for x in
                             jax.tree.leaves(model2.state.params["encoder"])])
    np.testing.assert_allclose(np.asarray(enc_a), np.asarray(enc_b))

    # transfer into an ASR model with the same encoder config
    from conformer_nemo_tpu.api import ConformerCTC

    cfg = {
        "model": {
            "sample_rate": sr,
            "labels": [" ", "a", "b"],
            "preprocessor": {"features": 32},
            "encoder": {
                "feat_in": 32, "n_layers": 2, "d_model": 32, "n_heads": 4,
                "subsampling_factor": 4, "conv_norm_type": "layer_norm",
            },
            "train_ds": {"manifest_filepath": manifest, "batch_size": 2},
            "optim": {"name": "adamw", "lr": 0.1,
                      "sched": {"name": "NoamAnnealing", "d_model": 32,
                                "warmup_steps": 10}},
        },
        "trainer": {"max_epochs": 1},
    }
    from conformer_nemo_tpu.data.tokenizers import CharTokenizer

    asr = ConformerCTC(cfg, CharTokenizer([" ", "a", "b"]), dtype=jnp.float32)
    asr.fit(manifest, max_steps=1)
    before = np.asarray(jax.tree.leaves(
        asr.state.params["encoder"])[0]).copy()
    model.transfer_encoder_to(asr)
    leaves_ssl = jax.tree.leaves(model.state.params["encoder"])
    leaves_asr = jax.tree.leaves(asr.state.params["encoder"])
    assert all(np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(leaves_ssl, leaves_asr))


def test_conv_feature_encoder():
    from conformer_nemo_tpu.models.ssl import (
        ConvFeatureEncoder, ConvFeatureEncoderConfig)

    cfg = ConvFeatureEncoderConfig(
        conv_layers=((16, 10, 5), (16, 3, 2), (16, 2, 2)), dtype=jnp.float32)
    enc = ConvFeatureEncoder(cfg)
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, 1000))
    lens = jnp.array([1000, 600])
    variables = enc.init(jax.random.PRNGKey(1), wav, lens)
    out, out_lens = enc.apply(variables, wav, lens)
    # conv arithmetic: ((1000-10)/5+1 -> 199; (199-3)/2+1 -> 99; (99-2)/2+1 -> 49)
    assert out.shape == (2, 16, 49)
    assert np.asarray(out_lens).tolist() == [49, int(((600-10)//5+1-3)//2+1-2)//2+1]


def test_lstm_decoder_head():
    from conformer_nemo_tpu.models.rnn_encoder import (
        LSTMDecoder, LSTMDecoderConfig)

    cfg = LSTMDecoderConfig(feat_in=12, num_classes=5, lstm_hidden_size=8,
                            bidirectional=True, dtype=jnp.float32)
    dec = LSTMDecoder(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 20))
    variables = dec.init(jax.random.PRNGKey(1), x)
    logp = dec.apply(variables, x)
    assert logp.shape == (2, 20, 6)
    np.testing.assert_allclose(
        np.asarray(jnp.exp(logp).sum(-1)), 1.0, rtol=1e-5)
