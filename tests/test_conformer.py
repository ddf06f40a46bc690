"""Conformer encoder: structural and numerical-semantics tests.

Parity targets: reference conformer_encoder.py / conformer_modules.py /
multi_head_attention.py / subsampling.py (see module docstrings).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conformer_nemo_tpu.models.conformer import (
    ConformerEncoder,
    ConformerEncoderConfig,
    _rel_shift,
    make_masks,
    sinusoidal_rel_pos_emb,
    subsampled_lengths,
)


def small_cfg(**kw):
    base = dict(
        feat_in=80, n_layers=2, d_model=64, n_heads=4, ff_expansion_factor=4,
        conv_kernel_size=31, conv_norm_type="layer_norm", dropout=0.0,
        dropout_att=0.0, dtype=jnp.float32,
    )
    base.update(kw)
    return ConformerEncoderConfig(**base)


def test_rel_shift_alignment():
    # After rel_shift, out[..., i, j] == x[..., i, (T-1) - i + j]
    # (position index p = L-1 - (i-j) holds embedding for relative offset i-j).
    t = 5
    x = np.arange(1 * 1 * t * (2 * t - 1), dtype=np.float32).reshape(1, 1, t, 2 * t - 1)
    out = np.asarray(_rel_shift(jnp.asarray(x)))[..., :t]
    for i in range(t):
        for j in range(t):
            assert out[0, 0, i, j] == x[0, 0, i, (t - 1) - i + j]


def test_subsampled_lengths_formula():
    # floor((L + 2 - 3)/2 + 1) twice for factor 4 (subsampling.py:272)
    lens = jnp.array([100, 101, 102, 103, 7, 1])
    out = np.asarray(subsampled_lengths(lens, 4))
    expected = []
    for l in [100, 101, 102, 103, 7, 1]:
        for _ in range(2):
            l = (l + 2 - 3) // 2 + 1
        expected.append(l)
    np.testing.assert_array_equal(out, expected)


def test_masks():
    cfg = small_cfg(att_context_size=(2, 1))
    pad_mask, att_mask = make_masks(cfg, 6, jnp.array([6, 4]))
    pad_mask, att_mask = np.asarray(pad_mask), np.asarray(att_mask)
    # pad_mask True means padded
    np.testing.assert_array_equal(pad_mask[1], [False] * 4 + [True] * 2)
    # banding: query i attends keys j with i-2 <= j <= i+1
    assert not att_mask[0, 3, 2]   # within left context
    assert att_mask[0, 3, 0]       # beyond left context -> masked
    assert not att_mask[0, 3, 4]   # right context 1 allowed
    assert att_mask[0, 3, 5]       # beyond right -> masked
    # padded keys masked for sample 1
    assert att_mask[1, 3, 4].all()


def test_encoder_shapes_and_padding_invariance():
    cfg = small_cfg()
    enc = ConformerEncoder(cfg)
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (2, 80, 64))
    lengths = jnp.array([64, 40])
    variables = enc.init(rng, feats, lengths, train=False)
    out, out_len = enc.apply(variables, feats, lengths, train=False)
    assert out.shape == (2, 64, 16)  # 4x subsampling
    np.testing.assert_array_equal(np.asarray(out_len), np.asarray(subsampled_lengths(lengths, 4)))

    # Padding invariance: changing padded region of input must not change
    # valid outputs (masks must fully isolate padding).
    feats2 = feats.at[1, :, 40:].set(123.0)
    out2, _ = enc.apply(variables, feats2, lengths, train=False)
    valid = int(np.asarray(out_len)[1])
    np.testing.assert_allclose(
        np.asarray(out[1, :, :valid]), np.asarray(out2[1, :, :valid]), rtol=2e-4, atol=2e-4
    )


def count_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


@pytest.mark.parametrize(
    "d_model,n_heads,n_layers,expected_m",
    [(176, 4, 16, 13), (512, 8, 18, 121)],
)
def test_param_count_matches_reference_sizes(d_model, n_heads, n_layers, expected_m):
    # Reference size table: configs/conformer_ctc_bpe.yaml:9-17
    cfg = ConformerEncoderConfig(
        feat_in=80, n_layers=n_layers, d_model=d_model, n_heads=n_heads,
        conv_norm_type="batch_norm", dtype=jnp.float32,
    )
    enc = ConformerEncoder(cfg)
    feats = jnp.zeros((1, 80, 32))
    variables = enc.init(jax.random.PRNGKey(0), feats, jnp.array([32]), train=False)
    n = count_params(variables["params"])
    assert abs(n / 1e6 - expected_m) / expected_m < 0.08, f"{n/1e6:.1f}M vs {expected_m}M"


def test_abs_pos_variant_runs():
    cfg = small_cfg(self_attention_model="abs_pos")
    enc = ConformerEncoder(cfg)
    feats = jnp.zeros((1, 80, 32))
    variables = enc.init(jax.random.PRNGKey(0), feats, jnp.array([32]), train=False)
    out, _ = enc.apply(variables, feats, jnp.array([32]), train=False)
    assert out.shape == (1, 64, 8)


def test_batch_norm_variant_train_updates_stats():
    cfg = small_cfg(conv_norm_type="batch_norm")
    enc = ConformerEncoder(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 80, 32))
    lengths = jnp.array([32, 32])
    variables = enc.init(jax.random.PRNGKey(0), feats, lengths, train=False)
    out, updates = enc.apply(
        variables, feats, lengths, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
    )
    assert "batch_stats" in updates


import jax.numpy as _jnp


@pytest.mark.parametrize("mode,t_out", [
    ("striding", 16), ("vggnet", 16), ("resnet", 16), ("subencoder", 16),
])
def test_subsampling_variants(mode, t_out):
    # All 4x modes reduce T=64 -> 16 (striding/subencoder via conv math,
    # vggnet/resnet via ceil-mode pooling).
    cfg = small_cfg(subsampling=mode, subsampling_conv_channels=8)
    enc = ConformerEncoder(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 80, 64))
    lengths = jnp.array([64, 40])
    variables = enc.init(jax.random.PRNGKey(0), feats, lengths, train=False)
    out, out_len = enc.apply(variables, feats, lengths, train=False)
    assert out.shape == (2, 64, t_out), (mode, out.shape)
    from conformer_nemo_tpu.models.conformer import calc_sub_length
    np.testing.assert_array_equal(
        np.asarray(out_len), np.asarray(calc_sub_length(lengths, mode, 2))
    )


def test_subsampling_length_formulas():
    from conformer_nemo_tpu.models.conformer import calc_sub_length
    # torch reference math: conv floor((L+2p-k)/s)+1; pool ceil((L-k)/s)+1
    lens = jnp.array([64, 63, 41, 7])
    # striding (p1 k3 s2 floor): 64->32->16 ; 63->32->16 ; 41->21->11 ; 7->4->2
    np.testing.assert_array_equal(np.asarray(calc_sub_length(lens, "striding", 2)), [16, 16, 11, 2])
    # vggnet (p0 k2 s2 ceil): 64->32->16 ; 63->32->16 ; 41->21->11 ; 7->4->2
    np.testing.assert_array_equal(np.asarray(calc_sub_length(lens, "vggnet", 2)), [16, 16, 11, 2])
    # subencoder (p1 k4 s2 floor): 64->32->16 ; 63->31->15 ; 41->20->10 ; 7->3->1
    np.testing.assert_array_equal(np.asarray(calc_sub_length(lens, "subencoder", 2)), [16, 15, 10, 1])


def test_relpos_decomposition_matches_rel_shift():
    # The sinusoidal angle-addition decomposition of the bd term must equal
    # the reference rel_shift formulation exactly (same params, fp32).
    from conformer_nemo_tpu.models.conformer import RelPosMultiHeadAttention

    cfg_dec = small_cfg(dropout_emb=0.0)          # decomposition path
    cfg_ref = small_cfg(dropout_emb=0.1)          # rel_shift path (dropout off in eval)
    t, b = 12, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, cfg_dec.d_model))
    pos_emb = jnp.asarray(sinusoidal_rel_pos_emb(t, cfg_dec.d_model))
    att_mask = jnp.zeros((b, t, t), bool)

    mod_dec = RelPosMultiHeadAttention(cfg_dec)
    variables = mod_dec.init(jax.random.PRNGKey(1), x, pos_emb, att_mask, deterministic=True)
    # give pos biases nonzero values so the bd term is exercised
    variables = jax.tree.map(
        lambda p: p + 0.1 if p.ndim == 2 and p.shape == (cfg_dec.n_heads, cfg_dec.d_head) else p,
        variables,
    )
    out_dec = mod_dec.apply(variables, x, pos_emb, att_mask, deterministic=True)
    mod_ref = RelPosMultiHeadAttention(cfg_ref)
    out_ref = mod_ref.apply(variables, x, pos_emb, att_mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_dec), np.asarray(out_ref), rtol=1e-4, atol=1e-4)


def test_untie_biases_false_shares_one_pair():
    """untie_biases=False: one pos_bias_u/v pair at encoder level shared by
    all layers (reference conformer_encoder.py:165-173)."""
    import jax
    import jax.numpy as jnp
    from conformer_nemo_tpu.models.conformer import ConformerEncoder, ConformerEncoderConfig

    cfg = ConformerEncoderConfig(
        feat_in=16, n_layers=2, d_model=32, n_heads=2,
        subsampling_conv_channels=32, untie_biases=False, dtype=jnp.float32)
    enc = ConformerEncoder(cfg)
    feats = jnp.zeros((1, 16, 64), jnp.float32)
    lens = jnp.array([64], jnp.int32)
    variables = enc.init(jax.random.PRNGKey(0), feats, lens)
    params = variables["params"]
    assert "pos_bias_u" in params and "pos_bias_v" in params
    assert "pos_bias_u" not in params["layers_0"]["self_attn"]
    out, olens = enc.apply(variables, feats, lens)
    assert out.shape[0] == 1

    cfg2 = ConformerEncoderConfig(
        feat_in=16, n_layers=2, d_model=32, n_heads=2,
        subsampling_conv_channels=32, untie_biases=True, dtype=jnp.float32)
    p2 = ConformerEncoder(cfg2).init(jax.random.PRNGKey(0), feats, lens)["params"]
    assert "pos_bias_u" in p2["layers_0"]["self_attn"]
    assert "pos_bias_u" not in p2


def test_fast_dropout_unbiased_and_rate():
    """FastDropout (uint8 bits): E[out] == x and the realized drop rate is
    round(rate*256)/256."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from conformer_nemo_tpu.models.conformer import FastDropout

    x = jnp.ones((512, 512), jnp.float32)
    mod = FastDropout(0.1)
    v = mod.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                 x, deterministic=False)
    out = mod.apply(v, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
    out = np.asarray(out)
    realized = float((out == 0).mean())
    expected = round(0.1 * 256) / 256  # 0.1015625
    assert abs(realized - expected) < 0.005
    # unbiased: mean preserved
    assert abs(out.mean() - 1.0) < 0.01
    # deterministic path is the identity
    same = mod.apply(v, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(x))
