"""SpecAugment family: distribution/shape semantics of the reference fork
(spectr_augment.py, audio_preprocessing.py:511-521)."""

import jax
import jax.numpy as jnp
import numpy as np

from conformer_nemo_tpu.audio.spec_augment import (
    SpecAugmentConfig,
    apply_spectrogram_augmentation,
    spec_augment,
    spec_shot,
)


def test_spec_augment_masks_bands():
    cfg = SpecAugmentConfig(freq_masks=2, time_masks=10, freq_width=27, time_width=0.05)
    spec = jnp.ones((4, 80, 200))
    lengths = jnp.array([200, 150, 100, 50])
    out = spec_augment(cfg, jax.random.PRNGKey(0), spec, lengths)
    out = np.asarray(out)
    assert out.shape == spec.shape
    # Some entries masked, some left intact.
    assert (out == 0).any()
    assert (out == 1).any()
    # Masked frequency rows are full bands across all time.
    full_freq_rows = (out == 0).all(axis=2)  # [B, D]
    assert full_freq_rows.any()


def test_adaptive_time_width_respects_length():
    # With time_width 0.05 and len=100, each time mask is at most 5 wide.
    cfg = SpecAugmentConfig(freq_masks=0, time_masks=1, time_width=0.05)
    spec = jnp.ones((1, 4, 400))
    lengths = jnp.array([100])
    widths = []
    for seed in range(50):
        out = np.asarray(spec_augment(cfg, jax.random.PRNGKey(seed), spec, lengths))
        widths.append(int((out[0, 0] == 0).sum()))
    assert max(widths) <= 5


def test_spec_shot_ratio():
    cfg = SpecAugmentConfig(specshot_ratio=0.3)
    spec = jnp.ones((2, 80, 500))
    out = np.asarray(spec_shot(cfg, jax.random.PRNGKey(0), spec))
    frac_masked = (out == 0).mean()
    assert 0.25 < frac_masked < 0.35


def test_chooser_single_augmentation():
    # All three enabled -> each call applies exactly one of them.
    cfg = SpecAugmentConfig(
        freq_masks=2, time_masks=2, freq_width=5, time_width=5,
        rect_masks=2, specshot_ratio=0.3,
    )
    assert cfg.enabled == ("spec_cutout", "spec_augment", "spec_shot")
    spec = jnp.ones((2, 80, 100))
    lengths = jnp.array([100, 100])
    out = apply_spectrogram_augmentation(cfg, jax.random.PRNGKey(3), spec, lengths)
    assert out.shape == spec.shape


def test_disabled_is_identity():
    cfg = SpecAugmentConfig()
    spec = jnp.ones((1, 8, 10))
    out = apply_spectrogram_augmentation(cfg, jax.random.PRNGKey(0), spec, jnp.array([10]))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(spec))


def test_masked_patch_augmentation_semantics():
    from conformer_nemo_tpu.audio.spec_augment import masked_patch_augmentation

    patch, m = 10, 3
    spec = jnp.ones((3, 8, 120))
    lengths = jnp.array([120, 100, 80])
    out = np.asarray(
        masked_patch_augmentation(jax.random.PRNGKey(0), spec, lengths, patch, m)
    )
    assert out.shape == spec.shape
    for i, ln in enumerate([120, 100, 80]):
        zero_cols = np.where((out[i] == 0).all(axis=0))[0]
        # masked frames come in whole patches aligned to patch boundaries
        assert len(zero_cols) == m * patch
        patches = np.unique(zero_cols // patch)
        assert len(patches) == m
        for p in patches:
            assert set(range(p * patch, (p + 1) * patch)) <= set(zero_cols.tolist())
            # candidate patches exclude the final (possibly partial) patch:
            # p in range(len//patch - 1)
            assert p < ln // patch - 1


def test_masked_patch_degrades_with_short_sample():
    from conformer_nemo_tpu.audio.spec_augment import masked_patch_augmentation

    # min_len 25 < patch*mask_patches=10*10 -> m_eff = 25//10 = 2 for ALL samples.
    # (The reference would raise here - its min-length sample has only 1
    # candidate patch; we clamp per sample instead.)
    spec = jnp.ones((2, 4, 120))
    lengths = jnp.array([120, 25])
    out = np.asarray(
        masked_patch_augmentation(jax.random.PRNGKey(1), spec, lengths, 10, 10)
    )
    long_cols = np.where((out[0] == 0).all(axis=0))[0]
    assert len(np.unique(long_cols // 10)) == 2
    short_cols = np.where((out[1] == 0).all(axis=0))[0]
    assert np.unique(short_cols // 10).tolist() == [0]


def test_crop_or_pad_spectrogram():
    from conformer_nemo_tpu.audio.spec_augment import crop_or_pad_spectrogram

    rng = jax.random.PRNGKey(0)
    # crop branch: values are contiguous slices of the input
    spec = jnp.arange(2 * 3 * 50, dtype=jnp.float32).reshape(2, 3, 50)
    out, lens = crop_or_pad_spectrogram(rng, spec, jnp.array([50, 40]), 20)
    assert out.shape == (2, 3, 20)
    assert np.asarray(lens).tolist() == [20, 20]
    row = np.asarray(out)[0, 0]
    start = int(row[0])
    assert np.allclose(row, np.arange(start, start + 20))
    # pad branch: symmetric zero pad, odd remainder goes right
    spec = jnp.ones((1, 2, 9))
    out, lens = crop_or_pad_spectrogram(rng, spec, jnp.array([9]), 12)
    assert out.shape == (1, 2, 12)
    o = np.asarray(out)[0, 0]
    assert (o[:1] == 0).all() and (o[10:] == 0).all() and (o[1:10] == 1).all()
