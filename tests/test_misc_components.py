"""MFCC, RNN encoder, timers, distributed helpers."""

import jax
import jax.numpy as jnp
import numpy as np

from conformer_nemo_tpu.audio.mfcc import MFCCConfig, dct_matrix, mfcc
from conformer_nemo_tpu.models.rnn_encoder import RNNEncoder, RNNEncoderConfig
from conformer_nemo_tpu.parallel.distributed import AppState, initialize_distributed
from conformer_nemo_tpu.utils.timers import NamedTimer


def test_mfcc_shapes_and_dct():
    cfg = MFCCConfig(n_mels=32, n_mfcc=16)
    wav = np.random.RandomState(0).randn(2, 16000).astype(np.float32) * 0.1
    out, lens = mfcc(cfg, wav, np.array([16000, 8000], np.int32))
    assert out.shape[0] == 2 and out.shape[1] == 16
    assert np.isfinite(np.asarray(out)).all()
    # DCT-II ortho basis is orthonormal over full square
    d = dct_matrix(32, 32, "ortho")
    np.testing.assert_allclose(d.T @ d, np.eye(32), atol=1e-5)


def test_mfcc_matches_scipy_dct():
    from scipy.fft import dct as scipy_dct

    x = np.random.RandomState(1).randn(5, 32).astype(np.float64)
    d = dct_matrix(32, 32, "ortho").astype(np.float64)
    ours = x @ d
    ref = scipy_dct(x, type=2, norm="ortho", axis=-1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)  # fp32 basis storage


def test_rnn_encoder_shapes():
    cfg = RNNEncoderConfig(
        feat_in=32, n_layers=2, d_model=24, proj_size=24,
        subsampling="striding", subsampling_factor=4,
        subsampling_conv_channels=8, dtype=jnp.float32,
    )
    enc = RNNEncoder(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 64))
    lengths = jnp.array([64, 32])
    variables = enc.init(jax.random.PRNGKey(0), feats, lengths, train=False)
    out, out_len = enc.apply(variables, feats, lengths, train=False)
    assert out.shape == (2, 24, 16)
    assert np.asarray(out_len).tolist() == [16, 8]


def test_named_timer():
    t = NamedTimer()
    t.start("a")
    t.stop("a")
    assert t.get("a") >= 0.0
    t.reset()
    assert t.get("a") is None


def test_distributed_single_process():
    pi, pc = initialize_distributed()
    assert (pi, pc) == (0, 1)
    st = AppState.current()
    assert st.is_main_process
    assert st.global_device_count == 8  # virtual CPU mesh


def test_typecheck_contracts():
    """Trace-time tensor contracts (reference typecheck/NeuralType analogue,
    common.py:795): rank, axis-letter consistency, dtype kind; zero device
    cost (checks run while tracing)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from conformer_nemo_tpu.utils.typecheck import (
        Spec, TypecheckError, check_shapes, typecheck)

    @typecheck(x=("B", "T"), lens=("B",), outputs=(("B", "T"),))
    def f(x, lens):
        return x * 2

    out = f(jnp.ones((2, 5)), jnp.ones((2,), jnp.int32))
    assert out.shape == (2, 5)

    with pytest.raises(TypecheckError):  # rank mismatch
        f(jnp.ones((2, 5, 1)), jnp.ones((2,), jnp.int32))
    with pytest.raises(TypecheckError):  # inconsistent 'B'
        f(jnp.ones((2, 5)), jnp.ones((3,), jnp.int32))

    # under jit: contract enforced at trace time
    with pytest.raises(TypecheckError):
        jax.jit(f)(jnp.ones((2, 5)), jnp.ones((3,), jnp.int32))
    assert jax.jit(f)(jnp.ones((2, 5)), jnp.ones((2,), jnp.int32)).shape == (2, 5)

    # dtype-kind specs + imperative form
    env = check_shapes(x=(np.ones((4, 3), np.float32), Spec(("B", "D"), dtype=np.floating)))
    with pytest.raises(TypecheckError):
        check_shapes(env, y=(np.ones((5,), np.int32), ("B",)))  # B already 4
    with pytest.raises(TypecheckError):
        check_shapes(z=(np.ones((2,), np.int32), Spec(("B",), dtype=np.floating)))

    # fixed-int axes
    @typecheck(x=(2, None))
    def g(x):
        return x
    g(np.zeros((2, 9)))
    with pytest.raises(TypecheckError):
        g(np.zeros((3, 9)))

    # the decorated library entry points still work end-to-end
    from conformer_nemo_tpu.ops.ctc_loss import ctc_loss
    lp = jax.nn.log_softmax(jnp.zeros((2, 6, 5)), axis=-1)
    loss = ctc_loss(lp, jnp.zeros((2, 3), jnp.int32), jnp.array([6, 6]),
                    jnp.array([3, 3]), blank_id=4)
    assert np.isfinite(float(loss))
    with pytest.raises(TypecheckError):  # targets batch mismatch
        ctc_loss(lp, jnp.zeros((3, 3), jnp.int32), jnp.array([6, 6]),
                 jnp.array([3, 3]), blank_id=4)
