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
