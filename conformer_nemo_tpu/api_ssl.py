"""High-level self-supervised pretraining model (wav2vec-style on spectrograms).

Parity target: reference `SpeechEncDecSelfSupervisedModel`
(`/root/reference/nemo/collections/asr/models/ssl_models.py:32-317`):
preprocessor -> (feature dropout) -> masking augmentation -> detect the mask
as near-zero bins -> encoder -> reconstruction decoder -> ContrastiveLoss on
(clean spectrograms, masks, decoder outputs); optional feature penalty
(`feat_pen = mean(spec^2) * factor`). The trained encoder transfers into an
ASR model for fine-tuning (`transfer_encoder_to`).

Training is a single jitted step over the data mesh; manifests reuse the ASR
text datasets with transcripts ignored.
"""

from __future__ import annotations

import time
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from conformer_nemo_tpu.audio.features import MelFeatureConfig, log_mel_spectrogram
from conformer_nemo_tpu.audio.spec_augment import masked_patch_augmentation
from conformer_nemo_tpu.data.dataset import BucketedAudioTextDataset, BucketedLoader
from conformer_nemo_tpu.data.manifest import read_manifest
from conformer_nemo_tpu.data.tokenizers import CharTokenizer
from conformer_nemo_tpu.models.conformer import ConformerEncoder, ConformerEncoderConfig
from conformer_nemo_tpu.models.ssl import (
    ReconstructionDecoder,
    ReconstructionDecoderConfig,
)
from conformer_nemo_tpu.ops.contrastive_loss import ContrastiveLoss, ContrastiveLossConfig
from conformer_nemo_tpu.parallel.mesh import make_mesh
from conformer_nemo_tpu.train.checkpoint import load_portable, save_portable
from conformer_nemo_tpu.train.trainer import TrainState


class _SSLNet(nn.Module):
    """encoder + reconstruction decoder + loss head in one module so the
    contrastive projection/quantizer params live in the same tree."""

    enc_cfg: ConformerEncoderConfig
    dec_cfg: ReconstructionDecoderConfig
    loss_cfg: ContrastiveLossConfig

    @nn.compact
    def __call__(self, spectrograms, spec_masks, masked_feats, lengths, *,
                 step, rng, train: bool):
        enc, enc_lens = ConformerEncoder(self.enc_cfg, name="encoder")(
            masked_feats, lengths, train=train)
        dec_out = ReconstructionDecoder(self.dec_cfg, name="decoder_ssl")(
            jnp.swapaxes(enc, 1, 2), train=train)
        loss = ContrastiveLoss(self.loss_cfg, name="loss")(
            spectrograms, spec_masks, dec_out, step=step, rng=rng, train=train)
        return loss, dec_out


class SpeechSSLModel:
    """Masked-spectrogram contrastive pretraining of a Conformer encoder."""

    def __init__(
        self,
        encoder: Optional[ConformerEncoderConfig] = None,
        mel: Optional[MelFeatureConfig] = None,
        loss: Optional[ContrastiveLossConfig] = None,
        decoder: Optional[ReconstructionDecoderConfig] = None,
        patch_size: int = 48,
        mask_patches: int = 10,
        dropout_features: float = 0.0,
        feature_penalty: float = 0.0,
        sample_rate: int = 16000,
    ):
        self.mel = mel or MelFeatureConfig()
        self.enc_cfg = encoder or ConformerEncoderConfig(
            feat_in=self.mel.features)
        sub = (self.enc_cfg.subsampling_factor
               if self.enc_cfg.subsampling != "none" else 1)
        self.loss_cfg = loss or ContrastiveLossConfig(
            in_dim=self.mel.features, combine_time_steps=sub)
        # default decoder keeps encoder frames (combine_time_steps covers the
        # subsampling); stride_layers>0 upsamples instead
        self.dec_cfg = decoder or ReconstructionDecoderConfig(
            feat_in=self.enc_cfg.d_model, feat_out=self.loss_cfg.proj_dim,
            stride_layers=0, dtype=self.enc_cfg.dtype)
        self.patch_size = patch_size
        self.mask_patches = mask_patches
        self.dropout_features = dropout_features
        self.feature_penalty = feature_penalty
        self.sample_rate = sample_rate
        self.net = _SSLNet(self.enc_cfg, self.dec_cfg, self.loss_cfg)
        self.state: Optional[TrainState] = None

    def _init_state(self, optimizer, t_frames=192):
        d = self.mel.features
        spec = jnp.zeros((1, d, t_frames), jnp.float32)
        lens = jnp.full((1,), t_frames, jnp.int32)
        variables = self.net.init(
            jax.random.PRNGKey(0), spec, spec, spec, lens,
            step=0, rng=jax.random.PRNGKey(0), train=False)
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        return TrainState.create(
            params, stats, optimizer.init(params), jax.random.PRNGKey(1))

    def fit(
        self,
        train_manifest: str,
        max_steps: int = 100,
        max_epochs: int = 1000000,
        batch_size: int = 8,
        lr: float = 1e-3,
        weight_decay: float = 1e-3,
        log_every_n_steps: int = 20,
    ):
        samples = read_manifest(train_manifest)
        ds = BucketedAudioTextDataset(
            samples, CharTokenizer([" "]), sample_rate=self.sample_rate,
            n_buckets=4)
        loader = BucketedLoader(
            ds, batch_size, shuffle=True,
            process_index=jax.process_index(),
            process_count=jax.process_count())

        optimizer = optax.adamw(lr, weight_decay=weight_decay)
        if self.state is None:
            self.state = self._init_state(optimizer)

        n_dev = len(jax.devices())
        data_axis = n_dev
        while data_axis > 1 and batch_size % data_axis != 0:
            data_axis -= 1
        mesh = make_mesh(data=data_axis, model=1,
                         devices=jax.devices()[:data_axis])
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sh = NamedSharding(mesh, P("data"))
        rep_sh = NamedSharding(mesh, P())

        net, mel = self.net, self.mel
        patch, n_patches = self.patch_size, self.mask_patches
        drop_p, pen = self.dropout_features, self.feature_penalty

        def step_fn(state, audio, lens):
            rng, new_rng = jax.random.split(state.rng)
            feat_rng, drop_rng, mask_rng, loss_rng, mdl_rng = jax.random.split(rng, 5)

            def loss_fn(params):
                spec, flens = log_mel_spectrogram(
                    mel, audio, lens, rng=feat_rng, training=True)
                spec = spec.astype(jnp.float32)
                feat_pen = pen * jnp.mean(jnp.square(spec)) if pen else 0.0
                feats = spec
                if drop_p > 0:
                    keep = jax.random.bernoulli(
                        drop_rng, 1.0 - drop_p, spec.shape)
                    feats = jnp.where(keep, spec / (1.0 - drop_p), 0.0)
                masked = masked_patch_augmentation(
                    mask_rng, feats, flens, patch, n_patches)
                t = masked.shape[-1]
                in_len = (jnp.arange(t)[None, :] < flens[:, None])[:, None, :]
                spec_masks = (
                    (jnp.abs(masked) < 1e-5) & in_len).astype(jnp.float32)
                variables = {"params": params}
                has_stats = bool(state.batch_stats)
                if has_stats:
                    variables["batch_stats"] = state.batch_stats
                out = net.apply(
                    variables, spec, spec_masks, masked, flens,
                    step=state.step, rng=loss_rng, train=True,
                    rngs={"dropout": mdl_rng},
                    mutable=["batch_stats"] if has_stats else False)
                if has_stats:
                    (loss, _), updates = out
                    new_stats = updates["batch_stats"]
                else:
                    (loss, _), new_stats = out, state.batch_stats
                return loss + feat_pen, new_stats

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = optax.adamw(lr, weight_decay=weight_decay).update(
                grads, state.opt_state, state.params)
            return state.replace(
                step=state.step + 1,
                params=optax.apply_updates(state.params, updates),
                batch_stats=new_stats, opt_state=new_opt, rng=new_rng,
            ), {"loss": loss}

        step_jit = jax.jit(
            step_fn, in_shardings=(rep_sh, batch_sh, batch_sh),
            out_shardings=(rep_sh, None), donate_argnums=(0,))

        step, t0, history, done = int(self.state.step), time.time(), [], False
        for _ in range(max_epochs):
            if done:
                break
            for batch in loader:
                self.state, metrics = step_jit(
                    self.state, jnp.asarray(batch.audio),
                    jnp.asarray(batch.audio_lens))
                step += 1
                if step % log_every_n_steps == 0 or step >= max_steps:
                    history.append({"step": step, "loss": float(metrics["loss"])})
                if step >= max_steps:
                    done = True
                    break
        return {"steps": step, "time_s": time.time() - t0, "history": history}

    # -- transfer / persistence ---------------------------------------------
    def transfer_encoder_to(self, asr_model) -> None:
        """Copy the pretrained encoder params into a ConformerCTC /
        ConformerTransducer state (the reference's init_from_nemo fine-tune
        flow). Shapes must match the ASR model's encoder config."""
        if asr_model.state is None:
            raise ValueError("fit/init the ASR model first (state is None)")
        src = jax.tree.map(jnp.shape, self.state.params["encoder"])
        dst = jax.tree.map(jnp.shape, asr_model.state.params["encoder"])
        if src != dst:
            raise ValueError(
                "encoder configs differ between SSL and ASR models "
                "(param shape trees do not match); use the same encoder "
                "config for pretraining and fine-tuning")
        params = dict(asr_model.state.params)
        params["encoder"] = self.state.params["encoder"]
        asr_model.state = asr_model.state.replace(params=params)

    def save_portable(self, path: str):
        save_portable(path, {"model": {"kind": "ssl"}},
                      {"params": self.state.params,
                       "batch_stats": self.state.batch_stats})

    def restore_weights(self, path: str):
        import flax.serialization as ser

        _cfg, blob, _ = load_portable(path)
        if self.state is None:
            self.state = self._init_state(optax.adamw(1e-3))
        template = {"params": self.state.params,
                    "batch_stats": self.state.batch_stats}
        restored = ser.from_state_dict(template, blob)
        self.state = self.state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"])
