"""Feature-frontend parity tests.

Oracle: an independent torch/numpy implementation of the reference
`FilterbankFeatures.forward` formula chain
(reference features.py:382-453), using torch.stft — the same native STFT the
reference calls — so any mismatch in framing/window/fft/normalization shows up.
"""

import numpy as np
import pytest
import torch

from conformer_nemo_tpu.audio.features import (
    MelFeatureConfig,
    log_mel_spectrogram,
    mel_filterbank,
    mel_seq_len,
    stft_basis,
)


def torch_oracle_logmel(cfg: MelFeatureConfig, wav: np.ndarray, lengths: np.ndarray):
    """Reference formula chain in torch (eval mode: no dither)."""
    x = torch.from_numpy(wav).float()
    n_fft, hop, win = cfg.n_fft_, cfg.hop_length, cfg.win_length
    seq_len = torch.floor(
        (torch.from_numpy(lengths).float() + 2 * (n_fft // 2) - n_fft) / hop
    ).long() + 1

    if cfg.preemph is not None:
        x = torch.cat((x[:, :1], x[:, 1:] - cfg.preemph * x[:, :-1]), dim=1)

    window = torch.hann_window(win, periodic=False)
    spec = torch.stft(
        x, n_fft=n_fft, hop_length=hop, win_length=win, center=True,
        window=window, return_complex=True,
    )
    mag2 = spec.real ** 2 + spec.imag ** 2  # [B, bins, T]
    fb = torch.from_numpy(mel_filterbank(cfg.sample_rate, n_fft, cfg.features))
    mel = torch.matmul(fb, mag2)
    mel = torch.log(mel + cfg.log_zero_guard_value)

    # per_feature masked normalization, torch.std is ddof=1
    out = torch.empty_like(mel)
    for i in range(mel.shape[0]):
        valid = mel[i, :, : seq_len[i]]
        mean = valid.mean(dim=1, keepdim=True)
        std = valid.std(dim=1, keepdim=True) + 1e-5
        out[i] = (mel[i] - mean) / std
    t_idx = torch.arange(mel.shape[-1])[None, :] >= seq_len[:, None]
    out = out.masked_fill(t_idx[:, None, :], 0.0)
    return out.numpy(), seq_len.numpy()


@pytest.fixture(scope="module")
def cfg():
    return MelFeatureConfig(dither=1e-5, pad_to=0)


def test_stft_matches_torch(cfg):
    rng = np.random.RandomState(0)
    wav = rng.randn(2, 4000).astype(np.float32)
    n_fft, hop, win = cfg.n_fft_, cfg.hop_length, cfg.win_length

    x = np.pad(wav, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    num_frames = (x.shape[1] - n_fft) // hop + 1
    idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[:, idx]
    basis = stft_basis(n_fft, win)
    ours = frames @ basis
    n_bins = n_fft // 2 + 1
    ours_pow = ours[..., :n_bins] ** 2 + ours[..., n_bins:] ** 2  # [B, F, bins]

    window = torch.hann_window(win, periodic=False)
    ref = torch.stft(
        torch.from_numpy(wav), n_fft=n_fft, hop_length=hop, win_length=win,
        center=True, window=window, return_complex=True,
    )
    ref_pow = (ref.real ** 2 + ref.imag ** 2).numpy().transpose(0, 2, 1)  # [B, F, bins]

    assert ours_pow.shape == ref_pow.shape
    np.testing.assert_allclose(ours_pow, ref_pow, rtol=1e-4, atol=1e-3)


def test_logmel_matches_reference_formulas(cfg):
    rng = np.random.RandomState(1)
    b, t = 3, 16000
    wav = (rng.randn(b, t) * 0.1).astype(np.float32)
    lengths = np.array([16000, 12345, 8000], dtype=np.int32)
    wav[1, 12345:] = 0.0
    wav[2, 8000:] = 0.0

    ref, ref_len = torch_oracle_logmel(cfg, wav, lengths)
    ours, ours_len = log_mel_spectrogram(cfg, wav, lengths, training=False)
    ours = np.asarray(ours)

    np.testing.assert_array_equal(np.asarray(ours_len), ref_len)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-3)


def test_seq_len_formula(cfg):
    # frames = floor((len + 2*(n_fft//2) - n_fft)/hop) + 1   (features.py:369)
    lens = np.array([160, 161, 319, 320, 16000], dtype=np.int32)
    expected = np.floor((lens + 512 - 512) / 160) + 1
    np.testing.assert_array_equal(np.asarray(mel_seq_len(cfg, lens)), expected.astype(np.int64))


def test_mel_filterbank_properties():
    fb = mel_filterbank(16000, 512, 80)
    assert fb.shape == (80, 257)
    # Triangles: nonnegative, each filter has a single contiguous support.
    assert (fb >= 0).all()
    support = fb > 0
    for m in range(80):
        nz = np.flatnonzero(support[m])
        assert nz.size > 0
        assert np.array_equal(nz, np.arange(nz[0], nz[-1] + 1))
    # Slaney normalization: peak amplitude decreases with center frequency in the log region.
    peaks = fb.max(axis=1)
    assert peaks[-1] < peaks[10]


def test_pad_to_multiple():
    cfg = MelFeatureConfig(pad_to=16)
    wav = np.zeros((1, 16000), dtype=np.float32)
    feats, _ = log_mel_spectrogram(cfg, wav, np.array([16000], dtype=np.int32))
    assert feats.shape[-1] % 16 == 0


def test_framed_dft_equals_framed_matmul():
    """The hop-decomposed gather-free DFT must equal frames @ basis exactly
    (up to fp32 partial-sum order) for assorted (n_fft, hop, T)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from conformer_nemo_tpu.audio.features import (
        _frame_signal, _framed_dft, stft_basis)

    rng = np.random.RandomState(0)
    for (n_fft, hop, t) in [(512, 160, 4512), (512, 160, 512), (400, 160, 2000),
                            (256, 300, 1500), (512, 512, 2048)]:
        x = jnp.asarray(rng.randn(3, t).astype(np.float32))
        basis = jnp.asarray(stft_basis(n_fft, n_fft))
        ref = jnp.einsum("bfn,nk->bfk", _frame_signal(x, n_fft, hop), basis,
                         precision=jax.lax.Precision.HIGHEST)
        new = _framed_dft(x, basis, n_fft, hop)
        assert ref.shape == new.shape
        err = float(jnp.max(jnp.abs(ref - new)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        assert err < 1e-6, (n_fft, hop, t, err)


@pytest.mark.parametrize("window", ["hamming", "blackman", "bartlett"])
def test_alternate_windows_match_torch(window):
    """Window set parity with the reference's torch_windows table
    (reference features.py:279-288)."""
    cfg = MelFeatureConfig(window=window)
    rng = np.random.RandomState(2)
    wav = rng.randn(2, 4000).astype(np.float32)
    n_fft, hop, win = cfg.n_fft_, cfg.hop_length, cfg.win_length

    x = np.pad(wav, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    num_frames = (x.shape[1] - n_fft) // hop + 1
    idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    ours = x[:, idx] @ stft_basis(n_fft, win, window)
    n_bins = n_fft // 2 + 1
    ours_pow = ours[..., :n_bins] ** 2 + ours[..., n_bins:] ** 2

    tw = {"hamming": torch.hamming_window, "blackman": torch.blackman_window,
          "bartlett": torch.bartlett_window}[window](win, periodic=False)
    ref = torch.stft(torch.from_numpy(wav), n_fft=n_fft, hop_length=hop,
                     win_length=win, center=True, window=tw, return_complex=True)
    ref_pow = (ref.real ** 2 + ref.imag ** 2).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours_pow, ref_pow, rtol=1e-4, atol=1e-3)


def test_exact_pad_matches_torch_center_false():
    """exact_pad: (n_fft-hop)//2 reflect pre-pad + center=False stft, and
    frames == len // hop (reference features.py:267,369-377,385-388)."""
    cfg = MelFeatureConfig(exact_pad=True, normalize="none", dither=0.0,
                           preemph=None, pad_to=0)
    rng = np.random.RandomState(3)
    wav = rng.randn(1, 16000).astype(np.float32)
    lens = np.array([16000], dtype=np.int32)
    n_fft, hop, win = cfg.n_fft_, cfg.hop_length, cfg.win_length

    assert int(np.asarray(mel_seq_len(cfg, lens))[0]) == 16000 // hop

    pad = (n_fft - hop) // 2
    x = torch.nn.functional.pad(
        torch.from_numpy(wav).unsqueeze(1), (pad, pad), "reflect").squeeze(1)
    spec = torch.stft(x, n_fft=n_fft, hop_length=hop, win_length=win,
                      center=False, window=torch.hann_window(win, periodic=False),
                      return_complex=True)
    mag2 = (spec.real ** 2 + spec.imag ** 2).numpy()
    fb = mel_filterbank(cfg.sample_rate, n_fft, cfg.features)
    ref = np.log(np.einsum("mk,bkt->bmt", fb, mag2) + cfg.log_guard)

    ours, ours_len = log_mel_spectrogram(cfg, wav, lens, training=False)
    ours = np.asarray(ours)
    assert int(np.asarray(ours_len)[0]) == 16000 // hop
    t = min(ours.shape[-1], ref.shape[-1])
    np.testing.assert_allclose(ours[..., :t], ref[..., :t], rtol=1e-3, atol=2e-3)


def test_log_zero_guard_clamp_and_named_values():
    wav = np.zeros((1, 4000), dtype=np.float32)  # silence -> zero power
    lens = np.array([4000], dtype=np.int32)
    clamp = MelFeatureConfig(log_zero_guard_type="clamp", log_zero_guard_value="eps",
                             normalize="none", preemph=None, pad_to=0)
    feats, _ = log_mel_spectrogram(clamp, wav, lens, training=False)
    np.testing.assert_allclose(
        np.asarray(feats), np.log(np.finfo(np.float32).eps), rtol=1e-6)
    tiny = MelFeatureConfig(log_zero_guard_value="tiny", normalize="none",
                            preemph=None, pad_to=0)
    feats, _ = log_mel_spectrogram(tiny, wav, lens, training=False)
    np.testing.assert_allclose(
        np.asarray(feats), np.log(np.finfo(np.float32).tiny), rtol=1e-6)


def test_fixed_mean_and_std_normalization():
    n_mels = 80
    mean = tuple(np.linspace(-3, 3, n_mels).tolist())
    std = tuple(np.linspace(0.5, 2.0, n_mels).tolist())
    base = MelFeatureConfig(normalize="none", pad_to=0)
    fixed = MelFeatureConfig(normalize="fixed_mean_and_std",
                             fixed_mean=mean, fixed_std=std, pad_to=0)
    rng = np.random.RandomState(4)
    wav = (rng.randn(2, 8000) * 0.1).astype(np.float32)
    lens = np.array([8000, 6000], dtype=np.int32)
    raw, seq = log_mel_spectrogram(base, wav, lens, training=False)
    out, _ = log_mel_spectrogram(fixed, wav, lens, training=False)
    ref = (np.asarray(raw) - np.asarray(mean)[None, :, None]) / np.asarray(std)[None, :, None]
    # beyond-length frames are re-filled with pad_value after normalization
    valid = np.arange(ref.shape[-1])[None, :] < np.asarray(seq)[:, None]
    ref = np.where(valid[:, None, :], ref, 0.0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_narrowband_augmentation_zeroes_high_bins():
    """nb_augmentation_prob=1: every FFT bin >= nb_max_freq is zeroed before
    the mel matmul (reference features.py:410-413)."""
    import jax

    cfg = MelFeatureConfig(nb_augmentation_prob=1.0, nb_max_freq=4000,
                           normalize="none", dither=0.0, preemph=None, pad_to=0)
    rng = np.random.RandomState(5)
    wav = rng.randn(2, 8000).astype(np.float32)
    lens = np.array([8000, 8000], dtype=np.int32)
    out, _ = log_mel_spectrogram(cfg, wav, lens, training=True,
                                 rng=jax.random.PRNGKey(0))
    out = np.asarray(out)

    n_fft = cfg.n_fft_
    nb_bin = int((cfg.nb_max_freq / cfg.sample_rate) * n_fft)
    fb = mel_filterbank(cfg.sample_rate, n_fft, cfg.features)
    # mel channels whose support lies entirely at/above the cut see only
    # zeroed power -> log(guard)
    hi_only = (fb[:, :nb_bin] == 0).all(axis=1) & (fb.sum(axis=1) > 0)
    assert hi_only.any()
    np.testing.assert_allclose(
        out[:, hi_only, :], np.log(cfg.log_guard), rtol=1e-6)
    # channels fully below the cut are untouched vs the un-augmented pipeline
    lo_only = (fb[:, nb_bin:] == 0).all(axis=1)
    base = MelFeatureConfig(normalize="none", dither=0.0, preemph=None, pad_to=0)
    ref, _ = log_mel_spectrogram(base, wav, lens, training=False)
    np.testing.assert_allclose(out[:, lo_only, :], np.asarray(ref)[:, lo_only, :],
                               rtol=1e-5, atol=1e-5)


def test_pad_to_max():
    cfg = MelFeatureConfig(pad_to="max", max_duration=2.0)
    wav = np.zeros((1, 16000), dtype=np.float32)
    feats, _ = log_mel_spectrogram(cfg, wav, np.array([16000], dtype=np.int32))
    expected = int(np.floor((2.0 * 16000 + 2 * (512 // 2) - 512) / 160) + 1)
    assert feats.shape[-1] == expected
