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
