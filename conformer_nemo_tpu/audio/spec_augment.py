"""Spectrogram augmentation (SpecAugment / SpecCutout / SpecShot), fully on-device.

Behavioral parity target: the reference's fork semantics
(`/root/reference/nemo/collections/asr/parts/submodules/spectr_augment.py` and
`audio_preprocessing.py:421-521`): the wrapper picks exactly ONE enabled
augmentation uniformly at random per batch; SpecAugment draws, per sample,
`freq_masks` frequency bands (start in [0, D-freq_width], width in
[0, freq_width]) and `time_masks` time bands whose max width adapts to the
valid length when `time_width` is a float.

TPU-native design: the reference runs host-side Python loops mutating the
tensor in place (and ships an unused CUDA kernel). Here mask generation is
vectorized `jax.random` + broadcasted-iota comparisons — the whole thing jits
into a handful of fused VPU ops, no kernel needed. Distributions match the
reference; the RNG stream obviously differs.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SpecAugmentConfig:
    """Schema mirror of reference `SpectrogramAugmentation.__init__`."""

    freq_masks: int = 0
    time_masks: int = 0
    freq_width: int = 10
    time_width: float = 10  # int -> fixed width; float in [0,1] -> fraction of length
    rect_masks: int = 0
    rect_time: int = 5
    rect_freq: int = 20
    specshot_ratio: float = 0.0
    augmask_value: float = 0.0

    @property
    def enabled(self) -> tuple[str, ...]:
        kinds = []
        if self.rect_masks > 0:
            kinds.append("spec_cutout")
        if self.freq_masks + self.time_masks > 0:
            kinds.append("spec_augment")
        if self.specshot_ratio > 0.0:
            kinds.append("spec_shot")
        return tuple(kinds)


def _band_mask(num_positions: int, starts: jnp.ndarray, widths: jnp.ndarray) -> jnp.ndarray:
    """OR of half-open bands [start, start+width) -> bool [B, num_positions].

    starts/widths: [B, n_masks] int32.
    """
    pos = jnp.arange(num_positions, dtype=jnp.int32)[None, None, :]  # [1, 1, P]
    s = starts[..., None]
    e = s + widths[..., None]
    return jnp.any((pos >= s) & (pos < e), axis=1)  # [B, P]


def _randint_incl(rng, shape, low, high):
    """Uniform ints in [low, high] inclusive (python random.randint semantics).

    `high` may be a traced array; jax.random.randint bounds are exclusive-high.
    """
    return jax.random.randint(rng, shape, low, jnp.asarray(high) + 1)


@partial(jax.jit, static_argnames=("cfg",))
def spec_augment(
    cfg: SpecAugmentConfig, rng: jax.Array, spec: jnp.ndarray, lengths: jnp.ndarray
) -> jnp.ndarray:
    """SpecAugment masking of spec [B, D, T] with valid frame lengths [B]."""
    b, d, t = spec.shape
    r_fs, r_fw, r_ts, r_tw = jax.random.split(rng, 4)
    mask = jnp.zeros((b, d, t), dtype=bool)

    if cfg.freq_masks > 0:
        f_start = _randint_incl(r_fs, (b, cfg.freq_masks), 0, d - cfg.freq_width)
        f_width = _randint_incl(r_fw, (b, cfg.freq_masks), 0, cfg.freq_width)
        mask = mask | _band_mask(d, f_start, f_width)[:, :, None]

    if cfg.time_masks > 0:
        if isinstance(cfg.time_width, float) and cfg.time_width <= 1.0:
            width_max = jnp.maximum(1, (lengths.astype(jnp.float32) * cfg.time_width).astype(jnp.int32))
        else:
            width_max = jnp.full((b,), int(cfg.time_width), dtype=jnp.int32)
        start_max = jnp.maximum(1, lengths.astype(jnp.int32) - width_max)
        t_start = _randint_incl(r_ts, (b, cfg.time_masks), 0, start_max[:, None])
        t_width = _randint_incl(r_tw, (b, cfg.time_masks), 0, width_max[:, None])
        mask = mask | _band_mask(t, t_start, t_width)[:, None, :]

    return jnp.where(mask, cfg.augmask_value, spec)


@partial(jax.jit, static_argnames=("cfg",))
def spec_cutout(cfg: SpecAugmentConfig, rng: jax.Array, spec: jnp.ndarray) -> jnp.ndarray:
    """Zero random rectangles (Cutout), spec [B, D, T]."""
    b, d, t = spec.shape
    r_fx, r_fy, r_wx, r_wy = jax.random.split(rng, 4)
    n = cfg.rect_masks
    x0 = _randint_incl(r_fx, (b, n), 0, d - cfg.rect_freq)
    y0 = _randint_incl(r_fy, (b, n), 0, t - cfg.rect_time)
    wx = _randint_incl(r_wx, (b, n), 0, cfg.rect_freq)
    wy = _randint_incl(r_wy, (b, n), 0, cfg.rect_time)
    drow = jnp.arange(d, dtype=jnp.int32)[None, None, :, None]
    dcol = jnp.arange(t, dtype=jnp.int32)[None, None, None, :]
    rect = (
        (drow >= x0[..., None, None])
        & (drow < (x0 + wx)[..., None, None])
        & (dcol >= y0[..., None, None])
        & (dcol < (y0 + wy)[..., None, None])
    )
    return jnp.where(jnp.any(rect, axis=1), 0.0, spec)


@partial(jax.jit, static_argnames=("cfg",))
def spec_shot(cfg: SpecAugmentConfig, rng: jax.Array, spec: jnp.ndarray) -> jnp.ndarray:
    """Fork's SpecShot: iid Bernoulli keep-mask with keep prob (1 - ratio)."""
    keep = jax.random.uniform(rng, spec.shape) > cfg.specshot_ratio
    return spec * keep.astype(spec.dtype)


@partial(jax.jit, static_argnames=("patch_size", "mask_patches"))
def masked_patch_augmentation(
    rng: jax.Array,
    spec: jnp.ndarray,
    lengths: jnp.ndarray,
    patch_size: int = 48,
    mask_patches: int = 10,
) -> jnp.ndarray:
    """Fixed-size time-patch masking for SSL pretraining.

    Parity target: reference `MaskedPatchAugmentation.forward`
    (`/root/reference/nemo/collections/asr/modules/audio_preprocessing.py:524-587`):
    every sample gets the SAME number of masked patches
    `m = min(mask_patches, min(lengths) // patch_size)`; per sample the
    candidate patches are indices `0 .. cur_len//patch_size - 2` (the
    reference's `range(cur_len // patch_size - 1)`), sampled without
    replacement; each selected patch zeroes frames
    [p*patch_size, (p+1)*patch_size).

    TPU-native: sampling-without-replacement is done by ranking iid uniform
    scores per candidate patch (invalid candidates get +inf) — one argsort per
    sample, fully vectorized, no host loop.

    Deviation: when the degradation branch triggers, the reference's own code
    raises (the min-length sample has `len//patch - 1 < m_eff` candidates, so
    its `random.sample` fails); here each sample masks
    `min(m_eff, its candidate count)` patches instead of crashing.
    """
    b, d, t = spec.shape
    max_patches = max(t // patch_size, 1)
    # m_eff (traced): the reference degrades the global patch count when the
    # shortest sample can't fit mask_patches patches. Rows too short to fit
    # even one patch (e.g. partial-batch pad rows) are ignored in the min —
    # they get no masking anyway and must not disable it for real samples.
    lens = lengths.astype(jnp.int32)
    min_len = jnp.min(
        jnp.where(lens >= patch_size, lens, jnp.iinfo(jnp.int32).max))
    min_len = jnp.where(min_len == jnp.iinfo(jnp.int32).max, 0, min_len)
    m_eff = jnp.where(
        min_len < patch_size * mask_patches, min_len // patch_size, mask_patches
    )

    n_candidates = lengths.astype(jnp.int32) // patch_size - 1  # [B]
    patch_idx = jnp.arange(max_patches, dtype=jnp.int32)[None, :]  # [1, P]
    valid = patch_idx < n_candidates[:, None]  # [B, P]
    scores = jax.random.uniform(rng, (b, max_patches))
    scores = jnp.where(valid, scores, jnp.inf)
    # rank of each candidate patch among its sample's scores
    order = jnp.argsort(scores, axis=1)  # [B, P] patch ids, best first
    ranks = jnp.argsort(order, axis=1)  # rank per patch id
    patch_masked = valid & (ranks < m_eff)  # [B, P]

    frame_patch = jnp.minimum(jnp.arange(t, dtype=jnp.int32) // patch_size, max_patches - 1)
    frame_masked = jnp.take_along_axis(
        patch_masked, frame_patch[None, :].repeat(b, axis=0), axis=1
    )  # [B, T]
    return jnp.where(frame_masked[:, None, :], 0.0, spec)


@partial(jax.jit, static_argnames=("audio_length",))
def crop_or_pad_spectrogram(
    rng: jax.Array, spec: jnp.ndarray, lengths: jnp.ndarray, audio_length: int
):
    """Crop (random offset per sample) or symmetrically zero-pad the time axis
    to exactly `audio_length` frames; lengths all become `audio_length`.

    Parity target: reference `CropOrPadSpectrogramAugmentation.forward`
    (`/root/reference/nemo/collections/asr/modules/audio_preprocessing.py:590-660`).
    The crop/pad decision is shape-static so both branches jit cleanly.
    """
    b, d, t = spec.shape
    out_lengths = jnp.full_like(lengths, audio_length)
    if t > audio_length:
        offsets = jax.random.randint(rng, (b,), 0, t - audio_length + 1)
        out = jax.vmap(
            lambda s, o: jax.lax.dynamic_slice(s, (0, o), (d, audio_length))
        )(spec, offsets)
    else:
        pad_left = (audio_length - t) // 2
        pad_right = pad_left + ((audio_length - t) % 2)
        out = jnp.pad(spec, ((0, 0), (0, 0), (pad_left, pad_right)))
    return out, out_lengths


def apply_spectrogram_augmentation(
    cfg: SpecAugmentConfig, rng: jax.Array, spec: jnp.ndarray, lengths: jnp.ndarray
) -> jnp.ndarray:
    """Pick ONE enabled augmentation uniformly at random per call (fork rule,
    audio_preprocessing.py:511-521) and apply it."""
    kinds = cfg.enabled
    if not kinds:
        return spec
    r_choice, r_apply = jax.random.split(rng)
    branches = []
    for kind in kinds:
        if kind == "spec_augment":
            branches.append(lambda s, l, r: spec_augment(cfg, r, s, l))
        elif kind == "spec_cutout":
            branches.append(lambda s, l, r: spec_cutout(cfg, r, s))
        else:
            branches.append(lambda s, l, r: spec_shot(cfg, r, s))
    if len(branches) == 1:
        return branches[0](spec, lengths, r_apply)
    which = jax.random.randint(r_choice, (), 0, len(branches))
    return jax.lax.switch(which, branches, spec, lengths, r_apply)
