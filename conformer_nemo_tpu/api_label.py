"""High-level label-task models: speech classification / VAD and speaker ID.

Parity targets:
- `EncDecClassificationModel` — reference
  `/root/reference/nemo/collections/asr/models/classification_models.py:380-627`
  (MatchboxNet-style conv encoder + pooled linear head, CE loss, top-k
  accuracy, `transcribe()` returning label strings, `change_labels`).
- `EncDecSpeakerLabelModel` — reference
  `/root/reference/nemo/collections/asr/models/label_models.py:45-480`
  (ECAPA/TitaNet-style encoder + SpeakerDecoder, CE or angular loss,
  `get_embedding`, `verify_speakers`, `get_batch_embeddings`).

The torch-Lightning plumbing is replaced by a jitted sharded train step over
a `jax` data mesh; datasets use the repeat-collate loaders from
`data/audio_to_label.py`.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from conformer_nemo_tpu.audio.features import MelFeatureConfig, log_mel_spectrogram
from conformer_nemo_tpu.audio.spec_augment import (
    SpecAugmentConfig,
    apply_spectrogram_augmentation,
)
from conformer_nemo_tpu.data.audio_io import load_audio
from conformer_nemo_tpu.data.audio_to_label import (
    AudioToLabelDataset,
    FixedSeqLabelLoader,
    repeat_to_length,
)
from conformer_nemo_tpu.models.classification import (
    ClassificationDecoder,
    ClassificationDecoderConfig,
)
from conformer_nemo_tpu.models.conv_asr import (
    ConvASREncoder,
    ConvASREncoderConfig,
    JasperBlockConfig,
)
from conformer_nemo_tpu.models.tdnn import (
    ECAPAEncoder,
    ECAPAEncoderConfig,
    SpeakerDecoder,
    SpeakerDecoderConfig,
)
from conformer_nemo_tpu.ops.classification_losses import (
    angular_softmax_loss,
    cross_entropy_loss,
    mse_loss,
    top_k_counts,
)
from conformer_nemo_tpu.parallel.mesh import make_mesh
from conformer_nemo_tpu.train.checkpoint import load_portable, save_portable
from conformer_nemo_tpu.train.trainer import TrainState


def matchboxnet_blocks(num_blocks: int = 3, repeat: int = 1, width: int = 64):
    """MatchboxNet-3x1x64-style topology (reference matchboxnet configs:
    prologue conv, B sub-blocks, dilated epilogue, 1x1 head)."""
    blocks = [JasperBlockConfig(filters=128, repeat=1, kernel=11, stride=1,
                                residual=False, separable=True)]
    for i in range(num_blocks):
        blocks.append(JasperBlockConfig(filters=width, repeat=repeat,
                                        kernel=13 + 2 * i, residual=True,
                                        separable=True, dropout=0.0))
    blocks.append(JasperBlockConfig(filters=128, repeat=1, kernel=29,
                                    dilation=2, residual=False, separable=True))
    blocks.append(JasperBlockConfig(filters=128, repeat=1, kernel=1,
                                    residual=False))
    return blocks


class _ClassificationNet(nn.Module):
    enc_cfg: ConvASREncoderConfig
    dec_cfg: ClassificationDecoderConfig

    @nn.compact
    def __call__(self, feats, lengths, *, train: bool):
        x, l = ConvASREncoder(self.enc_cfg, name="encoder")(feats, lengths, train=train)
        return ClassificationDecoder(self.dec_cfg, name="decoder")(
            jnp.swapaxes(x, 1, 2), l)


class _SpeakerNet(nn.Module):
    enc_cfg: ECAPAEncoderConfig
    dec_cfg: SpeakerDecoderConfig

    @nn.compact
    def __call__(self, feats, lengths, *, train: bool):
        x = jnp.swapaxes(feats, 1, 2)  # [B, T, D]
        h, l = ECAPAEncoder(self.enc_cfg, name="encoder")(x, lengths, train=train)
        return SpeakerDecoder(self.dec_cfg, name="decoder")(h, l, train=train)


class _EncDecLabelModel:
    """Shared fit/evaluate scaffolding (mirrors _BaseASRModel in api.py)."""

    kind = "label"

    def __init__(
        self,
        labels: Sequence[str],
        sample_rate: int = 16000,
        mel: Optional[MelFeatureConfig] = None,
        spec_augment: Optional[SpecAugmentConfig] = None,
    ):
        self.labels = list(labels)
        self.sample_rate = sample_rate
        self.mel = mel or MelFeatureConfig(features=64)
        self.spec_augment = spec_augment or SpecAugmentConfig()
        self.state: Optional[TrainState] = None
        self.net = self._build_net()

    # subclass contract: _build_net(), _loss(logits_out, labels), _logits(out)
    metric_name = "acc"

    def _build_net(self) -> nn.Module:
        raise NotImplementedError

    def _loss(self, out, labels):
        raise NotImplementedError

    def _logits(self, out):
        return out

    def _step_metric(self, logits, labels):
        """In-step training metric (top-1 accuracy by default)."""
        correct, total = top_k_counts(logits, labels, (1,))
        return correct[0] / jnp.maximum(total[0], 1)

    def _make_dataset(self, manifest: str) -> AudioToLabelDataset:
        return AudioToLabelDataset(manifest, self.labels,
                                   sample_rate=self.sample_rate)

    # ------------------------------------------------------------------
    def _features(self, audio, lens, rng=None, training=False):
        return log_mel_spectrogram(
            self.mel, audio, lens, rng=rng, training=training)

    def _init_state(self, optimizer, example_t_frames=128):
        feats = jnp.zeros((1, self.mel.features, example_t_frames), jnp.float32)
        lens = jnp.full((1,), example_t_frames, jnp.int32)
        variables = self.net.init(jax.random.PRNGKey(0), feats, lens, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return TrainState.create(
            params, batch_stats, optimizer.init(params), jax.random.PRNGKey(1))

    def _apply(self, state, feats, lens, train=False, rng=None):
        variables = {"params": state.params}
        has_stats = bool(state.batch_stats)
        if has_stats:
            variables["batch_stats"] = state.batch_stats
        kwargs = {}
        if rng is not None:
            kwargs["rngs"] = {"dropout": rng}
        if train:
            out, updates = self.net.apply(
                variables, feats, lens, train=True,
                mutable=["batch_stats"] if has_stats else False, **kwargs)
            return out, updates.get("batch_stats", state.batch_stats)
        return self.net.apply(variables, feats, lens, train=False), state.batch_stats

    def fit(
        self,
        train_manifest: str,
        val_manifest: Optional[str] = None,
        max_steps: int = 100,
        max_epochs: int = 1000000,
        batch_size: int = 32,
        fixed_seconds: float = 4.0,
        lr: float = 1e-3,
        weight_decay: float = 1e-4,
        augment: bool = False,
        log_every_n_steps: int = 20,
    ):
        ds = self._make_dataset(train_manifest)
        n_dev = len(jax.devices())
        data_axis = n_dev
        while data_axis > 1 and batch_size % data_axis != 0:
            data_axis -= 1
        mesh = make_mesh(data=data_axis, model=1, devices=jax.devices()[:data_axis])
        loader = FixedSeqLabelLoader(
            ds, batch_size, fixed_seconds, shuffle=True, drop_last=False,
            process_index=jax.process_index(), process_count=jax.process_count())

        optimizer = optax.adamw(lr, weight_decay=weight_decay)
        if self.state is None:
            self.state = self._init_state(optimizer)
        else:
            self.state = self.state.replace(opt_state=optimizer.init(self.state.params))

        spec_aug = self.spec_augment if augment else None
        net, mel = self.net, self.mel
        loss_of = self._loss
        logits_of = self._logits
        metric_of = self._step_metric
        metric_name = self.metric_name

        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sh = NamedSharding(mesh, P("data"))
        rep_sh = NamedSharding(mesh, P())

        def step_fn(state, audio, lens, labels):
            rng, new_rng = jax.random.split(state.rng)
            feat_rng, aug_rng, drop_rng = jax.random.split(rng, 3)

            def loss_fn(params):
                feats, flens = log_mel_spectrogram(
                    mel, audio, lens, rng=feat_rng, training=True)
                if spec_aug is not None and spec_aug.enabled:
                    feats = apply_spectrogram_augmentation(
                        spec_aug, aug_rng, feats, flens)
                variables = {"params": params}
                has_stats = bool(state.batch_stats)
                if has_stats:
                    variables["batch_stats"] = state.batch_stats
                out = net.apply(
                    variables, feats, flens, train=True,
                    rngs={"dropout": drop_rng},
                    mutable=["batch_stats"] if has_stats else False)
                if has_stats:
                    out, updates = out
                    new_stats = updates["batch_stats"]
                else:
                    new_stats = state.batch_stats
                return loss_of(out, labels), (new_stats, logits_of(out))

            (loss, (new_stats, logits)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = optax.adamw(lr, weight_decay=weight_decay).update(
                grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return state.replace(
                step=state.step + 1, params=new_params,
                batch_stats=new_stats, opt_state=new_opt, rng=new_rng,
            ), {"loss": loss, metric_name: metric_of(logits, labels)}

        step_jit = jax.jit(
            step_fn,
            in_shardings=(rep_sh, batch_sh, batch_sh, batch_sh),
            out_shardings=(rep_sh, None),
            donate_argnums=(0,),
        )

        step, t0 = int(self.state.step), time.time()
        history = []
        done = False
        for _ in range(max_epochs):
            if done:
                break
            for audio, lens, labels, _n in loader:
                self.state, metrics = step_jit(
                    self.state, jnp.asarray(audio), jnp.asarray(lens),
                    jnp.asarray(labels))
                step += 1
                if step % log_every_n_steps == 0 or step >= max_steps:
                    history.append(
                        {"step": step, "loss": float(metrics["loss"]),
                         metric_name: float(metrics[metric_name])})
                if step >= max_steps:
                    done = True
                    break
        result = {"steps": step, "time_s": time.time() - t0, "history": history}
        if val_manifest:
            result["val"] = self.evaluate(val_manifest, batch_size, fixed_seconds)
        return result

    def evaluate(self, manifest: str, batch_size: int = 32,
                 fixed_seconds: float = 4.0, top_k: Sequence[int] = (1,)):
        """Multi-batch top-k accuracy with summed correct/total counts
        (reference multi_*_epoch_end aggregation)."""
        ds = self._make_dataset(manifest)
        loader = FixedSeqLabelLoader(ds, batch_size, fixed_seconds)
        correct = np.zeros(len(top_k), np.int64)
        total = np.zeros(len(top_k), np.int64)
        for audio, lens, labels, n in loader:
            logits = self._infer_logits(jnp.asarray(audio), jnp.asarray(lens))
            c, t = top_k_counts(logits[:n], jnp.asarray(labels[:n]), tuple(top_k))
            correct += np.asarray(c)
            total += np.asarray(t)
        return {f"top{k}": float(c) / max(int(t), 1)
                for k, c, t in zip(top_k, correct, total)}

    def _infer_logits(self, audio, lens):
        feats, flens = self._features(audio, lens)
        out, _ = self._apply(self.state, feats, flens, train=False)
        return self._logits(out)

    # -- persistence -------------------------------------------------------
    def _arch_dict(self) -> dict:
        """Architecture kwargs to persist so restore_portable rebuilds the
        exact topology without the caller re-passing constructor args."""
        return {}

    def _config_dict(self) -> dict:
        return {
            "model": {
                "kind": self.kind,
                "labels": self.labels,
                "sample_rate": self.sample_rate,
                "preprocessor": dataclasses.asdict(self.mel),
                "arch": self._arch_dict(),
            }
        }

    def save_portable(self, path: str):
        save_portable(path, self._config_dict(),
                      {"params": self.state.params,
                       "batch_stats": self.state.batch_stats})

    @classmethod
    def restore_portable(cls, path: str, **kwargs):
        config, blob, _ = load_portable(path)
        m = config["model"]
        if "mel" not in kwargs and m.get("preprocessor"):
            kwargs["mel"] = MelFeatureConfig(**m["preprocessor"])
        for key, val in (m.get("arch") or {}).items():
            kwargs.setdefault(key, val)
        model = cls(labels=m["labels"], sample_rate=m["sample_rate"], **kwargs)
        opt = optax.adamw(1e-3)
        model.state = model._init_state(opt)
        template = {"params": model.state.params,
                    "batch_stats": model.state.batch_stats}
        import flax.serialization as ser

        restored = ser.from_state_dict(template, blob)
        model.state = model.state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"])
        return model


class ClassificationModel(_EncDecLabelModel):
    """Speech-command / VAD classification (EncDecClassificationModel parity)."""

    kind = "classification"

    def __init__(self, labels, sample_rate=16000, mel=None, spec_augment=None,
                 blocks=None, pooling_type: str = "avg", dtype=jnp.float32):
        def _mk(b):
            if isinstance(b, JasperBlockConfig):
                return b
            b = dict(b)
            # JSON round-trip turns a parallel-block kernel tuple into a list
            if isinstance(b.get("kernel"), list):
                b["kernel"] = tuple(b["kernel"])
            return JasperBlockConfig(**b)

        self._blocks = [_mk(b) for b in (blocks or matchboxnet_blocks())]
        self._pooling = pooling_type
        self._dtype = dtype
        super().__init__(labels, sample_rate, mel, spec_augment)

    def _build_net(self):
        enc = ConvASREncoderConfig(
            feat_in=self.mel.features, blocks=tuple(self._blocks),
            dtype=self._dtype)
        dec = ClassificationDecoderConfig(
            feat_in=self._blocks[-1].filters, num_classes=len(self.labels),
            pooling_type=self._pooling, dtype=self._dtype)
        return _ClassificationNet(enc, dec)

    def _arch_dict(self):
        return {"blocks": [dataclasses.asdict(b) for b in self._blocks],
                "pooling_type": self._pooling}

    def _loss(self, out, labels):
        return cross_entropy_loss(out, labels)

    def predict(self, audio_paths: Sequence[str], batch_size: int = 32,
                fixed_seconds: float = 4.0, logprobs: bool = False):
        """transcribe() parity (classification_models.py:268-351): label
        strings (or log-probs)."""
        t_fixed = int(fixed_seconds * self.sample_rate)
        outs: List[Any] = []
        for i in range(0, len(audio_paths), batch_size):
            chunk = audio_paths[i : i + batch_size]
            audio = np.zeros((len(chunk), t_fixed), np.float32)
            for row, p in enumerate(chunk):
                audio[row] = repeat_to_length(
                    load_audio(p, target_sr=self.sample_rate), t_fixed)
            lens = jnp.full((len(chunk),), t_fixed, jnp.int32)
            logits = self._infer_logits(jnp.asarray(audio), lens)
            if logprobs:
                outs.extend(np.asarray(jax.nn.log_softmax(logits, -1)))
            else:
                ids = np.asarray(jnp.argmax(logits, -1))
                outs.extend(self.labels[j] for j in ids)
        return outs

    def vad_frame_probs(self, wav: np.ndarray,
                        window_length_in_sec: float = 0.63,
                        shift_length_in_sec: float = 0.01,
                        speech_label: str = "speech",
                        batch_size: int = 256) -> np.ndarray:
        """Frame-level speech probabilities by sliding a window over the
        waveform: one softmax P(speech) per `shift_length_in_sec`
        (reference `generate_vad_frame_pred`, vad_utils.py:826-870 — there
        the windows come from a segmented manifest; here we slice the
        in-memory waveform directly, so no start/next/end edge trimming
        is needed). Postprocess with `decode.vad.postprocess_frame_predictions`.
        """
        try:
            speech_idx = self.labels.index(speech_label)
        except ValueError:
            speech_idx = len(self.labels) - 1
        win = int(window_length_in_sec * self.sample_rate)
        shift = int(shift_length_in_sec * self.sample_rate)
        wav = np.asarray(wav, np.float32)
        if len(wav) < win:
            wav = np.pad(wav, (0, win - len(wav)))
        n_frames = (len(wav) - win) // shift + 1
        probs = np.zeros(n_frames, np.float32)
        lens = jnp.full((batch_size,), win, jnp.int32)
        for i in range(0, n_frames, batch_size):
            n = min(batch_size, n_frames - i)
            batch = np.zeros((batch_size, win), np.float32)
            for r in range(n):
                s = (i + r) * shift
                batch[r] = wav[s : s + win]
            logits = self._infer_logits(jnp.asarray(batch), lens)
            p = jax.nn.softmax(logits, -1)[:, speech_idx]
            probs[i : i + n] = np.asarray(p)[:n]
        return probs

    def as_vad_callable(self, params: Optional[dict] = None,
                        window_length_in_sec: float = 0.63,
                        shift_length_in_sec: float = 0.01):
        """Adapter producing a `(wav, sr) -> [(start, end), ...]` function
        usable as `ClusteringDiarizer(vad=...)`, replacing its energy VAD
        with this neural model + reference postprocessing chain."""
        from conformer_nemo_tpu.decode.vad import postprocess_frame_predictions

        def _vad(wav, sr):
            if sr != self.sample_rate:
                raise ValueError(f"expected {self.sample_rate} Hz audio, got {sr}")
            probs = self.vad_frame_probs(
                wav, window_length_in_sec, shift_length_in_sec)
            return postprocess_frame_predictions(
                probs, params, shift_length_in_sec=shift_length_in_sec)

        return _vad

    def change_se_context_window(self, context_window: int):
        """Streaming-SE swap (reference change_conv_asr_se_context_window,
        asr_module_utils.py:24): parameters are untouched — only the SE
        pooling context of the rebuilt network changes."""
        from conformer_nemo_tpu.models.conv_asr import change_se_context_window

        self._blocks = change_se_context_window(self._blocks, context_window)
        self.net = self._build_net()

    def change_labels(self, new_labels: Sequence[str]):
        """Swap the head for a new label set, keeping the encoder
        (classification_models.py:559-609)."""
        old_params = self.state.params if self.state else None
        old_stats = self.state.batch_stats if self.state else None
        self.labels = list(new_labels)
        self.net = self._build_net()
        opt = optax.adamw(1e-3)
        self.state = self._init_state(opt)
        if old_params is not None:
            params = dict(self.state.params)
            params["encoder"] = old_params["encoder"]
            stats = dict(self.state.batch_stats)
            if old_stats and "encoder" in old_stats:
                stats["encoder"] = old_stats["encoder"]
            self.state = self.state.replace(params=params, batch_stats=stats)


class RegressionModel(ClassificationModel):
    """Speech regression (EncDecRegressionModel parity,
    classification_models.py:628-755): same conv encoder + pooled head with
    num_classes=1, MSE loss, MSE/MAE evaluation, `predict` -> floats."""

    kind = "regression"
    metric_name = "mse"

    def __init__(self, labels=(), sample_rate=16000, mel=None,
                 spec_augment=None, blocks=None, pooling_type: str = "avg",
                 dtype=jnp.float32):
        super().__init__(list(labels), sample_rate, mel, spec_augment,
                         blocks=blocks, pooling_type=pooling_type, dtype=dtype)

    def _build_net(self):
        enc = ConvASREncoderConfig(
            feat_in=self.mel.features, blocks=tuple(self._blocks),
            dtype=self._dtype)
        dec = ClassificationDecoderConfig(
            feat_in=self._blocks[-1].filters, num_classes=1,
            pooling_type=self._pooling, dtype=self._dtype)
        return _ClassificationNet(enc, dec)

    def _make_dataset(self, manifest: str) -> AudioToLabelDataset:
        return AudioToLabelDataset(manifest, sample_rate=self.sample_rate,
                                   is_regression_task=True)

    def _loss(self, out, labels):
        return mse_loss(out.reshape(-1), labels)

    def _logits(self, out):
        return out.reshape(-1)

    def _step_metric(self, preds, targets):
        return mse_loss(preds, targets)

    def evaluate(self, manifest: str, batch_size: int = 32,
                 fixed_seconds: float = 4.0, top_k: Sequence[int] = ()):
        """Summed-squared/absolute-error aggregation over batches
        (multi_validation_epoch_end, classification_models.py:707-719)."""
        ds = self._make_dataset(manifest)
        loader = FixedSeqLabelLoader(ds, batch_size, fixed_seconds)
        se = ae = 0.0
        count = 0
        for audio, lens, targets, n in loader:
            preds = np.asarray(
                self._infer_logits(jnp.asarray(audio), jnp.asarray(lens)))[:n]
            err = preds - targets[:n]
            se += float(np.sum(err ** 2))
            ae += float(np.sum(np.abs(err)))
            count += n
        denom = max(count, 1)
        return {"mse": se / denom, "mae": ae / denom}

    def predict(self, audio_paths: Sequence[str], batch_size: int = 32,
                fixed_seconds: float = 4.0, logprobs: bool = False):
        """transcribe() parity: predicted values as floats
        (classification_models.py:730-746)."""
        t_fixed = int(fixed_seconds * self.sample_rate)
        outs: List[float] = []
        for i in range(0, len(audio_paths), batch_size):
            chunk = audio_paths[i : i + batch_size]
            audio = np.zeros((len(chunk), t_fixed), np.float32)
            for row, p in enumerate(chunk):
                audio[row] = repeat_to_length(
                    load_audio(p, target_sr=self.sample_rate), t_fixed)
            lens = jnp.full((len(chunk),), t_fixed, jnp.int32)
            preds = self._infer_logits(jnp.asarray(audio), lens)
            outs.extend(float(v) for v in np.asarray(preds))
        return outs


class SpeakerLabelModel(_EncDecLabelModel):
    """Speaker recognition/verification (EncDecSpeakerLabelModel parity)."""

    kind = "speaker"

    def __init__(self, labels, sample_rate=16000, mel=None, spec_augment=None,
                 filters=(512, 512, 512, 512, 1536),
                 kernel_sizes=(5, 3, 3, 3, 1), dilations=(1, 2, 3, 4, 1),
                 scale=8, emb_sizes=(192,), pool_mode="attention",
                 angular=True, loss_scale=30.0, loss_margin=0.2,
                 dtype=jnp.float32):
        self._ecapa = dict(filters=tuple(filters),
                           kernel_sizes=tuple(kernel_sizes),
                           dilations=tuple(dilations), scale=scale)
        self._dec = dict(emb_sizes=tuple(emb_sizes), pool_mode=pool_mode,
                         angular=angular)
        self.angular = angular
        self.loss_scale = loss_scale
        self.loss_margin = loss_margin
        self._dtype = dtype
        super().__init__(labels, sample_rate, mel, spec_augment)

    def _arch_dict(self):
        return {**{k: list(v) if isinstance(v, tuple) else v
                   for k, v in self._ecapa.items()},
                "emb_sizes": list(self._dec["emb_sizes"]),
                "pool_mode": self._dec["pool_mode"],
                "angular": self.angular,
                "loss_scale": self.loss_scale,
                "loss_margin": self.loss_margin}

    def _build_net(self):
        enc = ECAPAEncoderConfig(feat_in=self.mel.features, dtype=self._dtype,
                                 **self._ecapa)
        dec = SpeakerDecoderConfig(
            feat_in=self._ecapa["filters"][-1], num_classes=len(self.labels),
            dtype=self._dtype, **self._dec)
        return _SpeakerNet(enc, dec)

    def _loss(self, out, labels):
        logits, _emb = out
        if self.angular:
            return angular_softmax_loss(
                logits, labels, self.loss_scale, self.loss_margin)
        return cross_entropy_loss(logits, labels)

    def _logits(self, out):
        return out[0]

    def get_embedding(self, audio_path: str) -> np.ndarray:
        """Speaker embedding for one file (label_models.py:388-419)."""
        wav = load_audio(audio_path, target_sr=self.sample_rate)
        audio = jnp.asarray(wav)[None, :]
        lens = jnp.asarray([len(wav)], jnp.int32)
        feats, flens = self._features(audio, lens)
        (_logits, emb), _ = self._apply(self.state, feats, flens, train=False)
        return np.asarray(emb[0])

    def verify_speakers(self, path1: str, path2: str,
                        threshold: float = 0.7) -> bool:
        """Cosine decision (label_models.py:422-448): score=(cos+1)/2 >= thr."""
        e1, e2 = self.get_embedding(path1), self.get_embedding(path2)
        e1 = e1 / np.linalg.norm(e1)
        e2 = e2 / np.linalg.norm(e2)
        score = (float(e1 @ e2) + 1.0) / 2.0
        return score >= threshold

    def get_batch_embeddings(self, manifest: str, batch_size: int = 32,
                             fixed_seconds: float = 4.0):
        """(embs, logits, labels, id2label) for a manifest
        (label_models.py:452-480)."""
        ds = AudioToLabelDataset(manifest, self.labels,
                                 sample_rate=self.sample_rate)
        loader = FixedSeqLabelLoader(ds, batch_size, fixed_seconds)
        all_embs, all_logits, all_labels = [], [], []
        for audio, lens, labels, n in loader:
            feats, flens = self._features(jnp.asarray(audio), jnp.asarray(lens))
            (logits, emb), _ = self._apply(self.state, feats, flens, train=False)
            all_embs.append(np.asarray(emb[:n]))
            all_logits.append(np.asarray(logits[:n]))
            all_labels.append(labels[:n])
        return (np.concatenate(all_embs), np.concatenate(all_logits),
                np.concatenate(all_labels), ds.id2label)
