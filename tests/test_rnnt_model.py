"""RNN-T model stack: prednet consistency, joint, fused-vs-unfused loss,
batched greedy decode, and a tiny overfit e2e."""

import jax
import jax.numpy as jnp
import numpy as np

from conformer_nemo_tpu.models.conformer import ConformerEncoderConfig
from conformer_nemo_tpu.models.rnnt import (
    PredictionNetwork,
    RNNTDecoderConfig,
    RNNTJoint,
    RNNTJointConfig,
    RNNTModel,
    RNNTModelConfig,
)
from conformer_nemo_tpu.decode.rnnt_greedy import rnnt_greedy_decode_batched

V = 5  # vocab (blank = 5)


def tiny_rnnt_cfg(**joint_kw):
    return RNNTModelConfig(
        encoder=ConformerEncoderConfig(
            feat_in=16, n_layers=1, d_model=32, n_heads=2, ff_expansion_factor=2,
            conv_kernel_size=7, conv_norm_type="layer_norm", dropout=0.0,
            dropout_att=0.0, dtype=jnp.float32,
        ),
        decoder=RNNTDecoderConfig(vocab_size=V, pred_hidden=24, dropout=0.0, dtype=jnp.float32),
        joint=RNNTJointConfig(joint_hidden=24, dropout=0.0, dtype=jnp.float32, **joint_kw),
    )


def test_prednet_sequence_vs_step_consistency():
    cfg = RNNTDecoderConfig(vocab_size=V, pred_hidden=16, pred_rnn_layers=2, dropout=0.0, dtype=jnp.float32)
    net = PredictionNetwork(cfg)
    targets = jnp.array([[1, 2, 3], [4, 0, 1]], dtype=jnp.int32)
    variables = net.init(jax.random.PRNGKey(0), targets)
    g_seq = net.apply(variables, targets)  # [B, U+1, H]
    assert g_seq.shape == (2, 4, 16)

    # replay with single steps
    state = net.apply(variables, 2, method=PredictionNetwork.zero_state)
    labels = jnp.concatenate([jnp.full((2, 1), V, jnp.int32), targets], axis=1)
    outs = []
    for u in range(4):
        g, state = net.apply(variables, labels[:, u], state, method=PredictionNetwork.step)
        outs.append(g)
    g_step = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(g_seq), np.asarray(g_step), rtol=1e-5, atol=1e-5)


def test_blank_embeds_to_zero():
    cfg = RNNTDecoderConfig(vocab_size=V, pred_hidden=8, dropout=0.0, dtype=jnp.float32)
    net = PredictionNetwork(cfg)
    targets = jnp.zeros((1, 1), jnp.int32)
    variables = net.init(jax.random.PRNGKey(0), targets)
    emb = net.apply(variables, jnp.array([[V]]), method=PredictionNetwork._embed)
    assert np.abs(np.asarray(emb)).max() == 0.0


def test_joint_shapes_and_single_step():
    jcfg = RNNTJointConfig(joint_hidden=16, dropout=0.0, dtype=jnp.float32)
    joint = RNNTJoint(jcfg, V + 1)
    enc = jnp.ones((2, 7, 12))
    pred = jnp.ones((2, 4, 10))
    variables = joint.init(jax.random.PRNGKey(0), enc, pred)
    full = joint.apply(variables, enc, pred)
    assert full.shape == (2, 7, 4, V + 1)
    one = joint.apply(variables, enc[:, 0], pred[:, 0])
    assert one.shape == (2, V + 1)
    np.testing.assert_allclose(np.asarray(full[:, 0, 0]), np.asarray(one), rtol=1e-5)


def _init_model(cfg, b=4, t=64, u=4, seed=0):
    model = RNNTModel(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(seed), (b, 16, t))
    feat_lens = jnp.full((b,), t, jnp.int32)
    targets = jax.random.randint(jax.random.PRNGKey(seed + 1), (b, u), 0, V)
    tgt_lens = jnp.full((b,), u, jnp.int32)
    variables = model.init(jax.random.PRNGKey(seed + 2), feats, feat_lens, targets, tgt_lens)
    return model, variables, feats, feat_lens, targets, tgt_lens


def test_fused_equals_unfused_loss():
    cfg_fused = tiny_rnnt_cfg(fuse_loss_wer=True, fused_batch_size=2)
    cfg_plain = tiny_rnnt_cfg(fuse_loss_wer=False)
    model, variables, feats, fl, tg, tl = _init_model(cfg_fused)
    nll_fused = model.apply(variables, feats, fl, tg, tl)
    model_plain = RNNTModel(cfg_plain)
    nll_plain = model_plain.apply(variables, feats, fl, tg, tl)
    assert nll_fused.shape == (4,)
    np.testing.assert_allclose(np.asarray(nll_fused), np.asarray(nll_plain), rtol=1e-5)


def test_greedy_decode_shapes():
    cfg = tiny_rnnt_cfg()
    model, variables, feats, fl, tg, tl = _init_model(cfg)
    enc, enc_lens = model.apply(variables, feats, fl, train=False, method=RNNTModel.encode)
    tokens, lens = rnnt_greedy_decode_batched(model, variables, enc, enc_lens, max_symbols=3)
    assert tokens.shape[0] == 4
    assert (np.asarray(lens) <= tokens.shape[1]).all()
    # every emitted token is a real label (not blank) within lens
    toks = np.asarray(tokens)
    for i, l in enumerate(np.asarray(lens)):
        assert (toks[i, :l] != cfg.blank_id).all()


def test_rnnt_overfit_and_decode():
    import optax

    cfg = tiny_rnnt_cfg()
    model, variables, feats, fl, tg, tl = _init_model(cfg, b=2, t=64, u=3, seed=7)
    params = variables["params"]
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            nll = model.apply({"params": p}, feats, fl, tg, tl)
            return jnp.mean(nll)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    losses = []
    for _ in range(150):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, losses[::30]

    # greedy decode should now reproduce the memorized targets
    enc, enc_lens = model.apply({"params": params}, feats, fl, train=False, method=RNNTModel.encode)
    tokens, lens = rnnt_greedy_decode_batched(model, {"params": params}, enc, enc_lens, max_symbols=3)
    toks = np.asarray(tokens)
    hyp0 = toks[0, : int(lens[0])].tolist()
    assert hyp0 == np.asarray(tg)[0].tolist(), (hyp0, np.asarray(tg)[0].tolist(), losses[-1])


def test_prednet_lstm_construction_knobs():
    """Chrono init, weights_init_scale, layer-norm LSTM, random state sampling
    (reference common/parts/rnn.py:25 rnn() factory + modules/rnnt.py:139-160)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from conformer_nemo_tpu.models.rnnt import PredictionNetwork, RNNTDecoderConfig

    # chrono: forget bias = log U(1, t_max-1), input bias = -forget
    cfg = RNNTDecoderConfig(vocab_size=8, pred_hidden=16, t_max=50, dtype=jnp.float32)
    net = PredictionNetwork(cfg)
    targets = jnp.zeros((2, 3), jnp.int32)
    params = net.init(jax.random.PRNGKey(0), targets)["params"]
    b = np.asarray(params["lstm0_b"])
    h = 16
    fb, ib = b[h:2*h], b[0:h]
    assert (fb >= 0).all() and (fb <= np.log(49.0) + 1e-6).all()
    np.testing.assert_allclose(ib, -fb, rtol=1e-6)

    # weights_init_scale scales weights
    cfg1 = RNNTDecoderConfig(vocab_size=8, pred_hidden=16, weights_init_scale=0.5, dtype=jnp.float32)
    p1 = PredictionNetwork(cfg1).init(jax.random.PRNGKey(0), targets)["params"]
    cfg2 = RNNTDecoderConfig(vocab_size=8, pred_hidden=16, dtype=jnp.float32)
    p2 = PredictionNetwork(cfg2).init(jax.random.PRNGKey(0), targets)["params"]
    np.testing.assert_allclose(np.asarray(p1["lstm0_wx"]), 0.5 * np.asarray(p2["lstm0_wx"]), rtol=1e-6)

    # layer-norm LSTM builds LN params and runs
    cfg3 = RNNTDecoderConfig(vocab_size=8, pred_hidden=16, norm="layer", dtype=jnp.float32)
    net3 = PredictionNetwork(cfg3)
    v3 = net3.init(jax.random.PRNGKey(0), targets)
    assert "lstm0_ln_i_scale" in v3["params"] and "lstm0_ln_c_scale" in v3["params"]
    out = net3.apply(v3, targets)
    assert out.shape == (2, 4, 16) and bool(jnp.isfinite(out).all())

    # random_state_sampling: training outputs differ across rng, eval identical
    cfg4 = RNNTDecoderConfig(vocab_size=8, pred_hidden=16, random_state_sampling=True, dtype=jnp.float32)
    net4 = PredictionNetwork(cfg4)
    v4 = net4.init(jax.random.PRNGKey(0), targets)
    o1 = net4.apply(v4, targets, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = net4.apply(v4, targets, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    e1 = net4.apply(v4, targets)
    e2 = net4.apply(v4, targets)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
