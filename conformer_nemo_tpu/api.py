"""High-level user API: build / fit / transcribe / save / restore.

Parity target: the reference's user-facing object model (`ModelPT`,
`/root/reference/nemo/core/classes/modelPT.py` + `EncDecCTCModel.transcribe`,
ctc_models.py:215-318):

    model = ConformerCTC.from_config_file("configs/conformer_ctc_bpe.yaml",
                                          tokenizer_dir=...)
    model.fit(train_manifest, val_manifest)
    hyps = model.transcribe(["a.wav", "b.wav"])
    model.save_portable("model.cntpu")
    model = ConformerCTC.restore_portable("model.cntpu")

The torch Lightning trainer/DDP plumbing is replaced by jitted sharded steps
over a jax Mesh; everything host-side (manifests, tokenizers, WER) is plain
Python.
"""

from __future__ import annotations

import dataclasses
import math
import os
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from conformer_nemo_tpu.audio.features import MelFeatureConfig
from conformer_nemo_tpu.audio.spec_augment import SpecAugmentConfig
from conformer_nemo_tpu.config.loader import (
    build_ctc_model_config,
    build_encoder_config,
    build_preprocessor_config,
    build_spec_augment_config,
    load_config,
)
from conformer_nemo_tpu.data.dataset import Batch, BucketedAudioTextDataset, BucketedLoader
from conformer_nemo_tpu.data.manifest import read_manifest
from conformer_nemo_tpu.data.tokenizers import CharTokenizer, build_tokenizer
from conformer_nemo_tpu.data.audio_io import load_audio
from conformer_nemo_tpu.models.ctc_model import CTCModelConfig
from conformer_nemo_tpu.models.rnnt import (
    RNNTDecoderConfig,
    RNNTJointConfig,
    RNNTModelConfig,
)
from conformer_nemo_tpu.parallel.mesh import make_mesh, shard_batch
from conformer_nemo_tpu.train.exp_manager import ExpManagerConfig, ExperimentManager
from conformer_nemo_tpu.train.lr_schedule import make_lr_schedule
from conformer_nemo_tpu.train.optim import make_optimizer
from conformer_nemo_tpu.train.checkpoint import load_portable, save_portable


@dataclasses.dataclass
class TranscriptionHypothesis:
    """User-facing decode result (reference rnnt_utils.Hypothesis:36 surface:
    score, y_sequence, text, timestep)."""

    score: float
    y_sequence: List[int]
    text: str
    timestep: Optional[List[int]] = None


def _batch_dict(batch: Batch):
    return {
        "audio": batch.audio, "audio_lens": batch.audio_lens,
        "tokens": batch.tokens, "token_lens": batch.token_lens,
    }


class _BaseASRModel:
    """Shared fit/transcribe scaffolding for CTC and RNNT models."""

    def __init__(self, raw_cfg: dict, tokenizer):
        self.raw_cfg = raw_cfg
        self.tokenizer = tokenizer
        self.state = None
        self._mesh = None

    # -- pretrained registry (reference common.py:610 Model surface) --------
    @classmethod
    def list_available_models(cls):
        from conformer_nemo_tpu.pretrained import list_available_models

        return list_available_models(cls.__name__)

    @classmethod
    def from_pretrained(cls, model_name: str, cache_dir: Optional[str] = None,
                        dtype=jnp.bfloat16):
        """Load a registered pretrained model from the local archive cache
        (reference Model.from_pretrained, common.py:610 — NGC download is
        replaced by local-cache resolution; see pretrained.py)."""
        from conformer_nemo_tpu.pretrained import resolve_pretrained

        return cls.restore_portable(resolve_pretrained(model_name, cache_dir), dtype=dtype)

    # -- subclass contract -------------------------------------------------
    def _make_optimizer(self):
        m = self.raw_cfg["model"]
        ocfg = m.get("optim", {"name": "adamw", "lr": 1.0})
        sched_cfg = dict(ocfg.get("sched", {"name": "NoamAnnealing", "d_model": 256, "warmup_steps": 1000}))
        sched = make_lr_schedule(sched_cfg, ocfg.get("lr", 1.0))
        trainer_cfg = self.raw_cfg.get("trainer", {})
        opt = make_optimizer(
            ocfg.get("name", "adamw"),
            sched,
            weight_decay=float(ocfg.get("weight_decay", 0.0)),
            betas=tuple(ocfg.get("betas", (0.9, 0.98))),
            grad_clip=trainer_cfg.get("gradient_clip_val") or None,
        )
        from conformer_nemo_tpu.train.optim import with_grad_accumulation

        return with_grad_accumulation(
            opt, int(trainer_cfg.get("accumulate_grad_batches", 1) or 1)
        )

    # implemented by subclasses:
    #   _init_state(optimizer) -> TrainState
    #   _make_train_step(optimizer, mesh) -> step fn
    #   _eval_wer(loader) -> dict with 'wer'
    #   _model_feat_dim() -> features count

    def _loader(self, manifest, ds_cfg, shuffle, seed=0):
        # waveform augmentation only on the training loader (reference
        # process_augmentations consumed from train_ds.augmentor,
        # audio_to_text_dataset.py:55)
        augmentor = None
        if shuffle and ds_cfg.get("augmentor"):
            from conformer_nemo_tpu.audio.perturb import process_augmentations

            augmentor = process_augmentations(ds_cfg["augmentor"], seed=seed)
        if ds_cfg.get("is_tarred"):
            # tarred/webdataset path (reference get_tarred_dataset,
            # audio_to_text_dataset.py:135: brace-expanded shards partitioned
            # by rank via tarred_shard_strategy, shuffle_n ring buffer)
            from conformer_nemo_tpu.data.tarred import (
                TarredAudioTextDataset, TarredBatchIterator)

            sr = ds_cfg.get("sample_rate", 16000)
            max_dur = float(ds_cfg.get("max_duration") or 20.0)
            ds = TarredAudioTextDataset(
                ds_cfg["tarred_audio_filepaths"], manifest, self.tokenizer,
                sample_rate=sr,
                shuffle_n=int(ds_cfg.get("shuffle_n", 0)) if shuffle else 0,
                min_duration=ds_cfg.get("min_duration"),
                max_duration=ds_cfg.get("max_duration"),
                shard_strategy=ds_cfg.get("tarred_shard_strategy", "scatter"),
                world_size=jax.process_count(),
                global_rank=jax.process_index(),
                seed=seed,
                augmentor=augmentor,
            )
            return TarredBatchIterator(
                ds, ds_cfg.get("batch_size", 16),
                max_samples_len=int(max_dur * sr),
                max_tokens=max(16, int(max_dur * 8)),
            )
        samples = read_manifest(
            manifest,
            min_duration=ds_cfg.get("min_duration"),
            max_duration=ds_cfg.get("max_duration"),
            max_number=ds_cfg.get("max_utts"),  # audio_to_text.py:236 max_utts
        )
        ds = BucketedAudioTextDataset(
            samples, self.tokenizer,
            sample_rate=ds_cfg.get("sample_rate", 16000),
            n_buckets=ds_cfg.get("num_buckets", 8),
            trim_silence=bool(ds_cfg.get("trim_silence", False)),
            use_start_end_token=bool(ds_cfg.get("use_start_end_token", False)),
            augmentor=augmentor,
        )
        return BucketedLoader(
            ds, ds_cfg.get("batch_size", 16),
            shuffle=shuffle, seed=seed,
            process_index=jax.process_index(), process_count=jax.process_count(),
            bucketing_strategy=ds_cfg.get("bucketing_strategy", "synced_randomized"),
            num_workers=int(ds_cfg.get("num_workers", 0) or 0),
            transport=ds_cfg.get("transport"),
        )

    def fit(
        self,
        train_manifest: Optional[str] = None,
        val_manifest: Optional[str] = None,
        max_steps: Optional[int] = None,
        max_epochs: Optional[int] = None,
        exp_manager: Optional[ExperimentManager] = None,
        val_every_n_steps: Optional[int] = None,
        log_every_n_steps: Optional[int] = None,
        max_time_s: Optional[float] = None,
    ):
        """max_time_s: graceful wall-clock stop with a final checkpoint — the
        reference StatelessTimer / SLURM max-time behavior (exp_manager.py:901)."""
        m = self.raw_cfg["model"]
        tr = self.raw_cfg.get("trainer", {})
        train_manifest = train_manifest or m["train_ds"]["manifest_filepath"]
        val_manifest = val_manifest or (m.get("validation_ds") or {}).get("manifest_filepath")
        max_epochs = max_epochs or tr.get("max_epochs", 1)
        max_steps = max_steps or tr.get("max_steps")
        log_every = log_every_n_steps or tr.get("log_every_n_steps", 10)

        mesh_cfg = tr.get("mesh") or {}
        model_axis = int(mesh_cfg.get("model", 1) or 1)
        # data axis must divide the (static) batch size; drop devices if needed
        batch_size = int(m.get("train_ds", {}).get("batch_size", 16))
        n_dev = len(jax.devices())
        data_axis = max(1, n_dev // model_axis)
        while data_axis > 1 and batch_size % data_axis != 0:
            data_axis -= 1
        self._mesh = make_mesh(
            data=data_axis, model=model_axis,
            devices=jax.devices()[: data_axis * model_axis],
        )

        optimizer = self._make_optimizer()
        if self.state is None:
            self.state = self._init_state(optimizer)
        # explicit checkpoint-dir resume (reference trainer.resume_from_checkpoint)
        rfc = tr.get("resume_from_checkpoint")
        if rfc:
            from conformer_nemo_tpu.train.checkpoint import restore_train_state

            restored, _ = restore_train_state(rfc, self.state)
            if restored is None:
                raise FileNotFoundError(f"resume_from_checkpoint: no checkpoint in {rfc}")
            self.state = restored
        if exp_manager is not None:
            restored, meta = exp_manager.maybe_resume(self.state)
            if restored is not None:
                self.state = restored
        step_fn = self._make_train_step(optimizer, self._mesh)

        train_loader = self._loader(train_manifest, m.get("train_ds", {}), shuffle=True)
        val_loader = (
            self._loader(val_manifest, m.get("validation_ds", {}), shuffle=False)
            if val_manifest
            else None
        )

        from conformer_nemo_tpu.data.prefetch import device_prefetch
        from conformer_nemo_tpu.parallel.mesh import batch_sharding

        # mid-epoch validation cadence: explicit arg, or trainer
        # val_check_interval — int = every N steps; float in (0, 1] = the
        # reference's fraction-of-epoch form (lightning semantics), resolved
        # against the train loader's batches-per-epoch
        vci = tr.get("val_check_interval")
        if val_every_n_steps is None and isinstance(vci, int) and vci > 0:
            val_every_n_steps = vci
        elif (val_every_n_steps is None and isinstance(vci, float)
              and 0 < vci <= 1 and hasattr(train_loader, "__len__")):
            val_every_n_steps = max(1, int(round(vci * len(train_loader))))

        def _validate(step):
            val = {}
            if val_loader is not None:
                val = self._eval_wer(val_loader)
                if exp_manager:
                    exp_manager.logger.log(step, val_wer=val["wer"],
                                           **({"val_loss": val["loss"]} if "loss" in val else {}))
            if exp_manager:
                exp_manager.save(self.state, step, {"val_wer": val.get("wer")})
            return val

        step = int(self.state.step)
        t0 = time.time()
        _tlog = [t0]  # last logging-window boundary (train_step_timing)
        metrics = {}
        sharding = batch_sharding(self._mesh)
        for epoch in range(max_epochs):
            batches = device_prefetch(
                (_batch_dict(b) for b in train_loader), sharding=sharding
            )
            for bd in batches:
                self.state, metrics = step_fn(self.state, bd)
                step += 1
                if step % log_every == 0:
                    loss = float(metrics["loss"])  # forces sync of the window
                    now = time.time()
                    if exp_manager:
                        # amortized wall time per step over the logging window
                        # (reference TimingCallback train_step_timing,
                        # exp_manager.py:121-163)
                        exp_manager.logger.log(
                            step, train_loss=loss,
                            grad_norm=float(metrics["grad_norm"]),
                            train_step_timing=(now - _tlog[0]) / log_every,
                        )
                    _tlog[0] = now
                if val_every_n_steps and step % val_every_n_steps == 0:
                    _validate(step)
                if max_steps and step >= max_steps:
                    break
                if max_time_s and time.time() - t0 > max_time_s:
                    if exp_manager:
                        exp_manager.save(self.state, step, {})
                    return {"steps": step, "time_s": time.time() - t0, "stopped": "max_time"}
            # end of epoch: validate + checkpoint
            _validate(step)
            if max_steps and step >= max_steps:
                break
        if exp_manager:
            exp_manager.wait_for_saves()
        return {"steps": step, "time_s": time.time() - t0, **({"last_loss": float(metrics["loss"])} if metrics else {})}

    def transcribe(self, audio_paths: Sequence[str], batch_size: int = 16,
                   logprobs: bool = False, return_hypotheses: bool = False,
                   longform_threshold_s: float = 60.0):
        """Offline transcription of audio files (ctc_models.transcribe parity:
        eval mode, dither off, bucket-padded batches).

        `logprobs=True` (CTC only, reference ctc_models.py:215) returns the
        per-file [T, V+1] log-probability arrays instead of text;
        `return_hypotheses=True` returns TranscriptionHypothesis objects
        (text + token ids + score, mirroring rnnt_utils.Hypothesis:36).

        Long-form: utterances longer than `longform_threshold_s` take an
        EXACT whole-utterance forward — one file per batch row, padded to a
        geometric length schedule (threshold x 2^k seconds, so arbitrary
        long lengths compile a bounded number of programs) — instead of the
        shared `batch_size`-row buffer. The encoder's flash/banded-flash
        dispatch keeps this exact path trained-model-faithful and
        memory-feasible to the measured T=24576 (~16 min audio) ceiling
        (docs/PERFORMANCE.md long-form matrix). The reference's only
        long-audio answer is approximate chunk-merge
        (streaming_utils.py:675 middle-token / :68 LCS), available here as
        `transcribe_buffered` — the bounded-memory fallback beyond the
        ceiling."""
        if logprobs and return_hypotheses:
            raise ValueError("logprobs and return_hypotheses are exclusive")
        mode = "logprobs" if logprobs else ("hypotheses" if return_hypotheses else "text")
        sr = self.raw_cfg["model"].get("sample_rate", 16000)
        wavs = [load_audio(p, target_sr=sr) for p in audio_paths]
        long_cut = int(longform_threshold_s * sr)
        short = [j for j, w in enumerate(wavs) if len(w) <= long_cut]
        # order by length for dense buckets, restore order at the end
        order = sorted(short, key=lambda j: len(wavs[j]))
        out = [None] * len(wavs)
        for i in range(0, len(order), batch_size):
            idxs = order[i : i + batch_size]
            chunk = [wavs[j] for j in idxs]
            t_cap = int(math.ceil(max(len(w) for w in chunk) / 1600.0)) * 1600
            audio = np.zeros((batch_size, t_cap), np.float32)
            lens = np.zeros((batch_size,), np.int32)
            for row, w in enumerate(chunk):
                audio[row, : len(w)] = w
                lens[row] = len(w)
            results = self._decode_audio_batch(audio, lens, mode=mode)[: len(chunk)]
            for j, r in zip(idxs, results):
                out[j] = r
        for j, w in enumerate(wavs):
            if len(w) <= long_cut:
                continue
            t_cap = long_cut
            while t_cap < len(w):
                t_cap *= 2
            audio = np.zeros((1, t_cap), np.float32)
            audio[0, : len(w)] = w
            out[j] = self._decode_audio_batch(
                audio, np.array([len(w)], np.int32), mode=mode)[0]
        return out

    @property
    def portable_variables(self) -> dict:
        """Combined variables dict for portable archives: batch_norm running
        stats must travel with the params or a restored model evaluates with
        zero-init stats. Every save path (model.save_portable, exp_manager /
        CLI always_save_portable) must go through this."""
        variables = {"params": self.state.params}
        if getattr(self.state, "batch_stats", None):
            variables["batch_stats"] = self.state.batch_stats
        return variables

    def save_portable(self, path: str, artifacts: Optional[dict] = None):
        save_portable(path, self.raw_cfg, self.portable_variables, artifacts)

    def export(self, path: str, batch_size: int = 8, seconds: float = 15.0,
               platforms: Optional[Sequence[str]] = None) -> str:
        """Serialize the inference graph(s) as a StableHLO archive
        (reference Exportable.export, core/classes/exportable.py:37 — ONNX
        there, `jax.export` here; see utils/export.py). Shapes are static:
        export once per serving bucket."""
        from conformer_nemo_tpu.utils.export import export_fn, save_exported

        sr = self.raw_cfg["model"].get("sample_rate", 16000)
        t = int(seconds * sr)
        fns = self._export_functions(batch_size, t)
        return save_exported(
            path,
            {name: export_fn(fn, args, platforms=platforms)
             for name, (fn, args) in fns.items()},
        )

    def _export_functions(self, batch_size: int, t_samples: int) -> dict:
        raise NotImplementedError


def _restore_portable_impl(cls, path: str, dtype):
    """Shared portable-archive restore for both model classes."""
    config, restored, artifacts = load_portable(path)
    m = config["model"]
    if "labels" in m and m.get("labels"):
        tokenizer = CharTokenizer(
            m["labels"], parser=(m.get("train_ds") or {}).get("parser", "base"))
    elif "tokenizer" in artifacts:
        from conformer_nemo_tpu.data.tokenizers import HFTokenizer

        tokenizer = HFTokenizer(artifacts["tokenizer"])
    elif artifacts and m.get("tokenizer"):
        # archive carries tokenizer files (e.g. a converted .nemo's
        # tokenizer.model); rebuild from the extraction dir
        from conformer_nemo_tpu.data.tokenizers import build_tokenizer

        tdir = os.path.dirname(next(iter(artifacts.values())))
        tcfg = {k: v for k, v in m["tokenizer"].items() if k != "dir"}
        if tcfg.get("type") == "agg":
            # converted multilang archives store per-language files flat
            # with unique basenames + relative `model_file` entries
            langs = {}
            for lang, sub in (tcfg.get("langs") or {}).items():
                sub = {k: v for k, v in sub.items() if k != "dir"}
                mf = sub.get("model_file")
                if not mf:
                    # artifacts are stored FLAT; pointing every language at
                    # the shared dir would silently load one tokenizer for
                    # all languages (wrong vocab past the first offset)
                    raise ValueError(
                        f"aggregate tokenizer config for lang {lang!r} has "
                        "no model_file entry; re-convert the archive with "
                        "scripts/convert_nemo.py (it writes per-language "
                        "model_file entries)")
                if not os.path.isabs(mf):
                    sub["model_file"] = os.path.join(tdir, mf)
                langs[lang] = sub
            tokenizer = build_tokenizer({**tcfg, "langs": langs})
        else:
            tokenizer = build_tokenizer({**tcfg, "dir": tdir})
    else:
        raise ValueError("no tokenizer artifact in portable archive")
    model = cls(config, tokenizer, dtype=dtype)
    state = model._init_state(model._make_optimizer())
    from flax import serialization

    if isinstance(restored, dict) and "params" in restored:
        # combined {'params', 'batch_stats'} archive (current format)
        params = serialization.from_state_dict(state.params, restored["params"])
        stats = restored.get("batch_stats")
        if stats is not None and state.batch_stats:
            stats = serialization.from_state_dict(state.batch_stats, stats)
            state = state.replace(batch_stats=stats)
    else:  # legacy params-only archive
        params = serialization.from_state_dict(state.params, restored)
    model.state = state.replace(params=params)
    return model


def _tokenizer_from_model_cfg(m: dict, tokenizer_dir: Optional[str] = None):
    """Tokenizer from a reference-shaped model config section: `labels`
    (char) or `tokenizer` (bpe/wpe/agg)."""
    if "labels" in m and m.get("labels"):
        # dataset-level `parser` key (reference AudioToCharDataset parser arg)
        return CharTokenizer(
            m["labels"], parser=(m.get("train_ds") or {}).get("parser", "base"))
    tok_cfg = dict(m.get("tokenizer") or {})
    if tokenizer_dir:
        tok_cfg["dir"] = tokenizer_dir
    return build_tokenizer(tok_cfg)


class ConformerCTC(_BaseASRModel):
    def __init__(self, raw_cfg: dict, tokenizer, dtype=jnp.bfloat16):
        super().__init__(raw_cfg, tokenizer)
        self.cfg: CTCModelConfig = build_ctc_model_config(
            raw_cfg, vocab_size=tokenizer.vocab_size, dtype=dtype
        )
        self._eval_step = None

    @classmethod
    def from_config_file(
        cls, path: str, tokenizer_dir: Optional[str] = None, overrides: Optional[dict] = None,
        dtype=jnp.bfloat16,
    ):
        raw = load_config(path, overrides)
        return cls(raw, _tokenizer_from_model_cfg(raw["model"], tokenizer_dir), dtype=dtype)

    @classmethod
    def restore_portable(cls, path: str, dtype=jnp.bfloat16):
        return _restore_portable_impl(cls, path, dtype)

    # -- subclass contract impls ------------------------------------------
    def _init_state(self, optimizer):
        from conformer_nemo_tpu.train.trainer import init_ctc_state

        d = self.cfg.preprocessor.features
        return init_ctc_state(self.cfg, optimizer, jax.random.PRNGKey(0), (1, d, 128))

    def _make_train_step(self, optimizer, mesh):
        from conformer_nemo_tpu.train.trainer import make_ctc_train_step

        return make_ctc_train_step(
            self.cfg, optimizer, mesh=mesh, state_template=self.state,
            skip_nan_grad=bool(self.raw_cfg["model"].get("skip_nan_grad", False)),
        )

    def _eval_wer(self, loader):
        from conformer_nemo_tpu.train.trainer import evaluate_wer, make_ctc_eval_step

        if self._eval_step is None:
            self._eval_step = make_ctc_eval_step(self.cfg)
        return evaluate_wer(self.cfg, self.state, loader, self.tokenizer, self._eval_step)

    def change_decoding_strategy(self, decoding_cfg: dict):
        """CTC decoding strategy swap: 'greedy' (default) or
        'beamsearch_ngram' — prefix beam search with optional ARPA n-gram LM
        fusion in native C++ (the reference's external ctc_decoders + KenLM
        Scorer, beam_search_decoder.py:21-103). beam keys: beam_width, alpha,
        beta, lm_path, nbest, kenlm_bin (opt-in direct reader for KenLM .bin
        files of the probing/trie/quant_trie structures; kenlm_probing is
        the original spelling of the same opt-in)."""
        strategy = decoding_cfg.get("strategy", "greedy")
        if strategy not in ("greedy", "beamsearch_ngram"):
            raise ValueError(f"unknown CTC decoding strategy {strategy!r}")
        self.raw_cfg["model"]["decoding"] = decoding_cfg
        self._beam_decoder = None

    def _get_beam_decoder(self):
        if getattr(self, "_beam_decoder", None) is None:
            from conformer_nemo_tpu.decode.ctc_beam import BeamSearchDecoderWithLM

            beam = (self.raw_cfg["model"].get("decoding") or {}).get("beam") or {}
            ids_to_tokens = getattr(self.tokenizer, "ids_to_tokens")
            vocab = ids_to_tokens(list(range(self.tokenizer.vocab_size)))
            self._beam_decoder = BeamSearchDecoderWithLM(
                vocab,
                beam_width=int(beam.get("beam_width", 64)),
                alpha=float(beam.get("alpha", 1.0)),
                beta=float(beam.get("beta", 1.5)),
                lm_path=beam.get("lm_path"),
                kenlm_bin=bool(beam.get("kenlm_bin",
                                        beam.get("kenlm_probing", False))),
            )
            # SentencePiece-style pieces mark word starts with '▁'
            self._beam_is_spm = any(t.startswith("▁") for t in vocab)
        return self._beam_decoder

    def change_vocabulary(self, tokenizer):
        """Swap tokenizer + decoder head for fine-tuning on a new vocabulary
        (reference change_vocabulary, ctc_models.py:320): encoder params are
        kept, the CTC head is re-initialized at the new size."""
        old_params = self.state.params if self.state is not None else None
        self.tokenizer = tokenizer
        self.cfg = dataclasses.replace(self.cfg, num_classes=tokenizer.vocab_size)
        self._eval_step = None
        self._logprob_step = None
        optimizer = self._make_optimizer()
        new_state = self._init_state(optimizer)
        if old_params is not None:
            params = dict(new_state.params)
            params["encoder"] = old_params["encoder"]
            new_state = new_state.replace(params=params)
        self.state = new_state

    def transcribe_with_timestamps(self, audio_paths: Sequence[str],
                                   batch_size: int = 16):
        """Per-file word timestamps from greedy CTC frame alignments
        (decoder_timestamps_utils.py `ctc_decoder_predictions_tensor_with_ts`
        + word grouping; CTM serialization via decode/timestamps.py)."""
        from conformer_nemo_tpu.decode.timestamps import (
            ctc_frame_alignments, words_from_alignments)
        from conformer_nemo_tpu.train.trainer import make_ctc_eval_step

        if self._eval_step is None:
            self._eval_step = make_ctc_eval_step(self.cfg)
        sr = self.raw_cfg["model"].get("sample_rate", 16000)
        time_per_frame = (self.cfg.preprocessor.window_stride
                          * self.cfg.encoder.subsampling_factor)
        wavs = [load_audio(p, target_sr=sr) for p in audio_paths]
        out = [None] * len(wavs)
        order = np.argsort([len(w) for w in wavs])
        for i in range(0, len(order), batch_size):
            idxs = order[i : i + batch_size]
            chunk = [wavs[j] for j in idxs]
            t_cap = int(math.ceil(max(len(w) for w in chunk) / 1600.0)) * 1600
            audio = np.zeros((batch_size, t_cap), np.float32)
            lens = np.zeros((batch_size,), np.int32)
            for row, w in enumerate(chunk):
                audio[row, : len(w)] = w
                lens[row] = len(w)
            bd = {"audio": audio, "audio_lens": lens,
                  "tokens": np.zeros((batch_size, 8), np.int32),
                  "token_lens": np.zeros((batch_size,), np.int32)}
            _, preds, enc_lens = self._eval_step(self.state, bd)
            aligns = ctc_frame_alignments(
                np.asarray(preds), np.asarray(enc_lens), self.cfg.blank_id)
            for row, j in enumerate(idxs):
                out[j] = words_from_alignments(
                    aligns[row], self.tokenizer, time_per_frame)
        return out

    def transcribe_buffered(self, audio_paths: Sequence[str],
                            frame_len: float = 1.6,
                            total_buffer: float = 4.0,
                            batch_size: int = 4) -> List[str]:
        """Long-form transcription via chunked buffers + middle-token merge
        (the reference's FrameBatchASR flow, streaming_utils.py:569-720, with
        the chunk math of its buffered-inference scripts:
        tokens_per_chunk = ceil(frame_len / model_stride),
        mid_delay = ceil((frame_len + (total - frame)/2) / model_stride)).
        Arbitrary-length audio; memory stays bounded by `total_buffer`."""
        from conformer_nemo_tpu.audio.features import log_mel_spectrogram
        from conformer_nemo_tpu.decode.streaming import FrameBatchASR
        from conformer_nemo_tpu.models.ctc_model import CTCModel

        cfg, state = self.cfg, self.state
        sr = self.raw_cfg["model"].get("sample_rate", 16000)
        stride = cfg.preprocessor.window_stride * cfg.encoder.subsampling_factor
        tokens_per_chunk = math.ceil(frame_len / stride)
        mid_delay = math.ceil((frame_len + (total_buffer - frame_len) / 2)
                              / stride)
        model = CTCModel(cfg)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats

        @jax.jit
        def _fwd(variables, feats, lens):
            # variables as an ARGUMENT: closed-over params would be embedded
            # as HLO constants (hundreds of MB for large models)
            log_probs, _ = model.apply(variables, feats, lens, train=False)
            return jnp.argmax(log_probs, axis=-1)

        def forward_fn(feats, lens):
            return _fwd(variables, jnp.asarray(feats, jnp.float32),
                        jnp.asarray(lens, jnp.int32))

        def feature_fn(samples):
            feats, _ = log_mel_spectrogram(
                cfg.preprocessor, jnp.asarray(samples, jnp.float32)[None],
                jnp.asarray([len(samples)], jnp.int32), training=False)
            return np.asarray(feats[0])

        asr = FrameBatchASR(
            forward_fn, feature_fn, self.tokenizer, cfg.blank_id,
            n_feat=cfg.preprocessor.features, frame_len=frame_len,
            total_buffer=total_buffer, batch_size=batch_size,
            window_stride=cfg.preprocessor.window_stride, sample_rate=sr)
        out = []
        for p in audio_paths:
            wav = load_audio(p, target_sr=sr)
            asr.reset()
            asr.read_audio_samples(wav, mid_delay, stride)
            out.append(asr.transcribe(tokens_per_chunk, mid_delay))
        return out

    def _export_functions(self, batch_size: int, t_samples: int) -> dict:
        """One function: audio -> (log_probs, enc_lens) (the reference's
        ExportableEncDecModel.forward_for_export, asr_model.py:103)."""
        from conformer_nemo_tpu.audio.features import log_mel_spectrogram
        from conformer_nemo_tpu.models.ctc_model import CTCModel

        if self.state is None:
            self.state = self._init_state(self._make_optimizer())
        cfg, state = self.cfg, self.state
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        model = CTCModel(cfg)

        def forward(audio, lens):
            feats, fl = log_mel_spectrogram(cfg.preprocessor, audio, lens,
                                            training=False)
            return model.apply(variables, feats, fl, train=False)

        args = (jax.ShapeDtypeStruct((batch_size, t_samples), jnp.float32),
                jax.ShapeDtypeStruct((batch_size,), jnp.int32))
        return {"forward": (forward, args)}

    def _decode_audio_batch(self, audio, lens, mode: str = "text"):
        from conformer_nemo_tpu.decode.ctc_greedy import collapse_ctc_ids
        from conformer_nemo_tpu.train.trainer import make_ctc_eval_step

        strategy = (self.raw_cfg["model"].get("decoding") or {}).get("strategy", "greedy")
        if mode == "text" and strategy == "beamsearch_ngram":
            dec = self._get_beam_decoder()
            lps = self._decode_audio_batch(audio, lens, mode="logprobs")
            nbest = dec(np.stack([
                np.pad(lp, ((0, max(l.shape[0] for l in lps) - lp.shape[0]), (0, 0)))
                for lp in lps
            ]), seq_lens=np.array([lp.shape[0] for lp in lps]))
            texts = [cands[0][0] if cands else "" for cands in nbest]
            if getattr(self, "_beam_is_spm", False):
                texts = [t.replace("▁", " ").strip() for t in texts]
            return texts
        if mode in ("logprobs", "hypotheses"):
            # full log-prob forward (reference transcribe(logprobs=True),
            # ctc_models.py:215-318)
            if getattr(self, "_logprob_step", None) is None:
                from conformer_nemo_tpu.audio.features import log_mel_spectrogram
                from conformer_nemo_tpu.models.ctc_model import CTCModel

                model = CTCModel(self.cfg)
                pre = self.cfg.preprocessor

                @jax.jit
                def _lp(params, batch_stats, audio, lens):
                    feats, fl = log_mel_spectrogram(pre, audio, lens, training=False)
                    variables = {"params": params}
                    if batch_stats:
                        variables["batch_stats"] = batch_stats
                    log_probs, enc_lens = model.apply(variables, feats, fl, train=False)
                    return log_probs, enc_lens

                self._logprob_step = _lp
            log_probs, enc_lens = self._logprob_step(
                self.state.params, self.state.batch_stats,
                jnp.asarray(audio, jnp.float32), jnp.asarray(lens, jnp.int32))
            log_probs, enc_lens = np.asarray(log_probs), np.asarray(enc_lens)
            if mode == "logprobs":
                return [log_probs[i, : enc_lens[i]] for i in range(audio.shape[0])]
            preds = log_probs.argmax(-1)
            frame_max = log_probs.max(-1)
            id_lists = collapse_ctc_ids(preds, enc_lens, self.cfg.blank_id)
            return [
                TranscriptionHypothesis(
                    score=float(frame_max[i, : enc_lens[i]].sum()),
                    y_sequence=ids, text=self.tokenizer.ids_to_text(ids),
                    timestep=None,
                )
                for i, ids in enumerate(id_lists)
            ]

        if self._eval_step is None:
            self._eval_step = make_ctc_eval_step(self.cfg)
        bd = {
            "audio": audio, "audio_lens": lens,
            "tokens": np.zeros((audio.shape[0], 8), np.int32),
            "token_lens": np.zeros((audio.shape[0],), np.int32),
        }
        _, preds, enc_lens = self._eval_step(self.state, bd)
        id_lists = collapse_ctc_ids(np.asarray(preds), np.asarray(enc_lens), self.cfg.blank_id)
        return [self.tokenizer.ids_to_text(ids) for ids in id_lists]


class ConformerTransducer(_BaseASRModel):
    def __init__(self, raw_cfg: dict, tokenizer, dtype=jnp.bfloat16):
        super().__init__(raw_cfg, tokenizer)
        from conformer_nemo_tpu.train.rnnt_trainer import RNNTTrainConfig

        m = raw_cfg["model"]
        enc = build_encoder_config(m.get("encoder", {}), dtype=dtype)
        defaults = m.get("model_defaults", {})
        dec_cfg = m.get("decoder", {})
        prednet = dec_cfg.get("prednet", {})
        joint_cfg = m.get("joint", {})
        jointnet = joint_cfg.get("jointnet", {})
        loss_cfg = m.get("loss") or {}
        # reference key is warprnnt_numba_kwargs (conformer_transducer_bpe.yaml:190);
        # rnnt_kwargs kept as an alias
        loss_kwargs = (loss_cfg.get("warprnnt_numba_kwargs")
                       or loss_cfg.get("rnnt_kwargs") or {})
        loss_name = loss_cfg.get("loss_name", "default")
        if loss_name not in ("default", "warprnnt_numba"):
            raise ValueError(
                f"unsupported transducer loss_name {loss_name!r} (the single "
                "TPU lattice implementation covers the reference's default/"
                "warprnnt_numba resolver entries; losses/rnnt.py:76)")
        vn = m.get("variational_noise") or {}
        self.cfg = RNNTTrainConfig(
            preprocessor=build_preprocessor_config(m.get("preprocessor", {})),
            spec_augment=build_spec_augment_config(m.get("spec_augment", {}) or {}),
            model=RNNTModelConfig(
                encoder=enc,
                decoder=RNNTDecoderConfig(
                    vocab_size=tokenizer.vocab_size,
                    pred_hidden=prednet.get("pred_hidden", defaults.get("pred_hidden", 640)),
                    pred_rnn_layers=prednet.get("pred_rnn_layers", 1),
                    dropout=prednet.get("dropout", 0.1),
                    # reference prednet/decoder knobs (modules/rnnt.py:139-160)
                    forget_gate_bias=float(prednet.get("forget_gate_bias", 1.0)),
                    t_max=prednet.get("t_max"),
                    weights_init_scale=float(prednet.get("weights_init_scale", 1.0)),
                    norm=dec_cfg.get("normalization_mode"),
                    random_state_sampling=bool(dec_cfg.get("random_state_sampling", False)),
                    blank_as_pad=bool(dec_cfg.get("blank_as_pad", True)),
                    dtype=dtype,
                ),
                joint=RNNTJointConfig(
                    joint_hidden=jointnet.get("joint_hidden", defaults.get("joint_hidden", 640)),
                    activation=jointnet.get("activation", "relu"),
                    dropout=jointnet.get("dropout", 0.1),
                    fuse_loss_wer=joint_cfg.get("fuse_loss_wer", True),
                    fused_batch_size=joint_cfg.get("fused_batch_size", 16),
                    dtype=dtype,
                ),
                fastemit_lambda=float(loss_kwargs.get("fastemit_lambda", 0.0)),
                clamp=float(loss_kwargs.get("clamp", -1.0)),
                # TPU-side implementation knobs (no reference analogue):
                # flash joint+loss kernels on TPU by default, dense
                # elsewhere; see models/rnnt.py RNNTModelConfig.
                joint_impl=joint_cfg.get("joint_impl", "auto"),
                joint_flash_bt=int(joint_cfg.get("joint_flash_bt", 16)),
                joint_flash_hbm_threshold=float(
                    joint_cfg.get("joint_flash_hbm_threshold", 5.0e9)),
            ),
            variational_noise_std=float(vn.get("std", 0.0)),
            variational_noise_start=int(vn.get("start_step", 0)),
        )
        self._eval_step = None
        self._decoding = None
        self._decoding_state_id = None
        self._max_symbols = int(
            ((m.get("decoding") or {}).get("greedy") or {}).get("max_symbols", 10)
        )

    def change_vocabulary(self, tokenizer):
        """Swap tokenizer + prediction/joint networks for fine-tuning on a
        new vocabulary (reference EncDecRNNTModel.change_vocabulary,
        rnnt_models.py:285 / rnnt_bpe_models.py): encoder params are kept,
        the prediction network and joint are re-initialized at the new size."""
        old_params = self.state.params if self.state is not None else None
        self.tokenizer = tokenizer
        self.cfg = dataclasses.replace(
            self.cfg,
            model=dataclasses.replace(
                self.cfg.model,
                decoder=dataclasses.replace(
                    self.cfg.model.decoder, vocab_size=tokenizer.vocab_size
                ),
            ),
        )
        self._eval_step = None
        self._decoding = None
        new_state = self._init_state(self._make_optimizer())
        if old_params is not None:
            params = dict(new_state.params)
            params["encoder"] = old_params["encoder"]
            new_state = new_state.replace(params=params)
        self.state = new_state

    def change_decoding_strategy(self, decoding_cfg: dict):
        """Swap the inference decoding strategy without touching weights
        (reference change_decoding_strategy, rnnt_models.py:403)."""
        self.raw_cfg["model"]["decoding"] = decoding_cfg
        self._decoding = None
        self._eval_step = None
        self._max_symbols = int(
            (decoding_cfg.get("greedy") or {}).get("max_symbols", 10) or 10)

    def _get_decoding(self):
        """RNNTDecoding facade bound to the CURRENT params (rebuilt after
        fit/restore changes the state object)."""
        from conformer_nemo_tpu.decode.rnnt_decoding import RNNTDecoding
        from conformer_nemo_tpu.models.rnnt import RNNTModel

        if self._decoding is None or self._decoding_state_id != id(self.state):
            variables = {"params": self.state.params}
            if self.state.batch_stats:
                variables["batch_stats"] = self.state.batch_stats
            self._decoding = RNNTDecoding(
                RNNTModel(self.cfg.model), variables, self.tokenizer,
                self.raw_cfg["model"].get("decoding") or {})
            self._decoding_state_id = id(self.state)
        return self._decoding

    @classmethod
    def from_config_file(
        cls, path: str, tokenizer_dir: Optional[str] = None, overrides: Optional[dict] = None,
        dtype=jnp.bfloat16,
    ):
        raw = load_config(path, overrides)
        return cls(raw, _tokenizer_from_model_cfg(raw["model"], tokenizer_dir), dtype=dtype)

    @classmethod
    def restore_portable(cls, path: str, dtype=jnp.bfloat16):
        return _restore_portable_impl(cls, path, dtype)

    def _init_state(self, optimizer):
        from conformer_nemo_tpu.train.rnnt_trainer import init_rnnt_state

        d = self.cfg.preprocessor.features
        return init_rnnt_state(self.cfg, optimizer, jax.random.PRNGKey(0), (1, d, 128))

    def _make_train_step(self, optimizer, mesh):
        from conformer_nemo_tpu.train.rnnt_trainer import make_rnnt_train_step

        return make_rnnt_train_step(
            self.cfg, optimizer, mesh=mesh, state_template=self.state,
            skip_nan_grad=bool(self.raw_cfg["model"].get("skip_nan_grad", False)),
        )

    def _eval_wer(self, loader):
        from conformer_nemo_tpu.train.rnnt_trainer import (
            evaluate_rnnt_wer, make_rnnt_eval_step, make_rnnt_loss_eval_step)

        if getattr(self, "_loss_eval_step", None) is None and self.raw_cfg["model"].get(
                "compute_eval_loss", False):
            self._loss_eval_step = make_rnnt_loss_eval_step(self.cfg)
        if self._eval_step is None:
            self._eval_step = make_rnnt_eval_step(self.cfg, max_symbols=self._max_symbols)
        return evaluate_rnnt_wer(self.cfg, self.state, loader, self.tokenizer, self._eval_step,
                                 loss_step=getattr(self, "_loss_eval_step", None))

    def _greedy_with_timestamps(self, audio, lens):
        """Jitted greedy decode that also returns per-token emission frames
        (reference greedy Hypothesis.timestep, rnnt_greedy_decoding.py)."""
        if getattr(self, "_hyp_step", None) is None or self._hyp_state_id != id(self.state):
            from conformer_nemo_tpu.audio.features import log_mel_spectrogram
            from conformer_nemo_tpu.decode.rnnt_greedy import rnnt_greedy_decode_batched
            from conformer_nemo_tpu.models.rnnt import RNNTModel

            model = RNNTModel(self.cfg.model)
            pre = self.cfg.preprocessor
            max_symbols = self._max_symbols

            @jax.jit
            def _step(variables, audio, lens):
                # variables as an ARGUMENT (not a closure): closed-over params
                # are embedded as HLO constants — ~0.5 GB program for large
                feats, fl = log_mel_spectrogram(pre, audio, lens, training=False)
                enc, enc_lens = model.apply(variables, feats, fl, train=False,
                                            method=RNNTModel.encode)
                return rnnt_greedy_decode_batched(
                    model, variables, enc, enc_lens, max_symbols=max_symbols,
                    return_timestamps=True)

            self._hyp_step = _step
            self._hyp_state_id = id(self.state)
        variables = {"params": self.state.params}
        if self.state.batch_stats:
            variables["batch_stats"] = self.state.batch_stats
        toks, tlens, steps = self._hyp_step(
            variables, jnp.asarray(audio, jnp.float32), jnp.asarray(lens, jnp.int32))
        return np.asarray(toks), np.asarray(tlens), np.asarray(steps)

    def transcribe_with_timestamps(self, audio_paths: Sequence[str],
                                   batch_size: int = 16):
        """Per-file word timestamps from transducer greedy emission frames
        (reference RNNT timestamp path, decoder_timestamps_utils.py)."""
        from conformer_nemo_tpu.decode.timestamps import (
            FrameAlignedToken, words_from_alignments)

        sr = self.raw_cfg["model"].get("sample_rate", 16000)
        stride = (self.cfg.preprocessor.window_stride
                  * self.cfg.model.encoder.subsampling_factor)
        wavs = [load_audio(p, target_sr=sr) for p in audio_paths]
        results = []
        for i in range(0, len(wavs), batch_size):
            chunk = wavs[i : i + batch_size]
            t_cap = int(math.ceil(max(len(w) for w in chunk) / 1600.0)) * 1600
            audio = np.zeros((len(chunk), t_cap), np.float32)
            lens = np.zeros((len(chunk),), np.int32)
            for row, w in enumerate(chunk):
                audio[row, : len(w)] = w
                lens[row] = len(w)
            toks, tlens, steps = self._greedy_with_timestamps(audio, lens)
            for row in range(len(chunk)):
                n = int(tlens[row])
                units = [
                    FrameAlignedToken(int(toks[row, j]), int(steps[row, j]),
                                      int(steps[row, j]) + 1, 1.0)
                    for j in range(n)
                ]
                results.append(words_from_alignments(units, self.tokenizer, stride))
        return results

    def transcribe_buffered(self, audio_paths: Sequence[str],
                            frame_len: float = 1.6,
                            total_buffer: float = 4.0,
                            batch_size: int = 4) -> List[str]:
        """Long-form transducer transcription: chunked buffers decoded with
        batched greedy, merged by token-level LCS overlap (the reference's
        LongestCommonSubsequenceBatchedFrameASRRNNT, streaming_utils.py:1071)."""
        from conformer_nemo_tpu.audio.features import log_mel_spectrogram
        from conformer_nemo_tpu.decode.rnnt_greedy import rnnt_greedy_decode_batched
        from conformer_nemo_tpu.decode.streaming import BatchedFrameASRRNNT
        from conformer_nemo_tpu.models.rnnt import RNNTModel

        cfg, state = self.cfg, self.state
        sr = self.raw_cfg["model"].get("sample_rate", 16000)
        stride = (cfg.preprocessor.window_stride
                  * cfg.model.encoder.subsampling_factor)
        mid_delay = math.ceil((frame_len + (total_buffer - frame_len) / 2)
                              / stride)
        model = RNNTModel(cfg.model)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats

        @jax.jit
        def _decode(variables, feats, lens):
            # variables as an ARGUMENT: closed-over params would be embedded
            # as HLO constants (hundreds of MB for large models)
            enc, enc_lens = model.apply(variables, feats, lens, train=False,
                                        method=RNNTModel.encode)
            return rnnt_greedy_decode_batched(
                model, variables, enc, enc_lens,
                max_symbols=self._max_symbols)

        def decode_fn(feats, lens):
            return _decode(variables, jnp.asarray(feats, jnp.float32),
                           jnp.asarray(lens, jnp.int32))

        def feature_fn(samples):
            feats, _ = log_mel_spectrogram(
                cfg.preprocessor, jnp.asarray(samples, jnp.float32)[None],
                jnp.asarray([len(samples)], jnp.int32), training=False)
            return np.asarray(feats[0])

        asr = BatchedFrameASRRNNT(
            decode_fn, feature_fn, self.tokenizer,
            n_feat=cfg.preprocessor.features, frame_len=frame_len,
            total_buffer=total_buffer, batch_size=batch_size,
            window_stride=cfg.preprocessor.window_stride, sample_rate=sr)
        out = []
        for p in audio_paths:
            wav = load_audio(p, target_sr=sr)
            asr.reset()
            asr.read_audio_samples(wav, mid_delay, stride)
            out.append(asr.transcribe())
        return out

    def _export_functions(self, batch_size: int, t_samples: int) -> dict:
        """Two functions mirroring the reference's RNNT export split
        (encoder + RNNTDecoderJoint wrapper, modules/rnnt.py:1086):
        `encoder`: audio -> (enc [B,T,D], enc_lens); `decoder_joint`: one
        decode step (enc_t, last_label, h, c) -> (logits, new_h, new_c)."""
        from conformer_nemo_tpu.audio.features import log_mel_spectrogram
        from conformer_nemo_tpu.models.rnnt import RNNTModel

        if self.state is None:
            self.state = self._init_state(self._make_optimizer())
        cfg, state = self.cfg, self.state
        mcfg = cfg.model
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        model = RNNTModel(mcfg)

        def encoder(audio, lens):
            feats, fl = log_mel_spectrogram(cfg.preprocessor, audio, lens,
                                            training=False)
            return model.apply(variables, feats, fl, train=False,
                               method=RNNTModel.encode)

        def decoder_joint(enc_t, last_label, h, c):
            g, (nh, nc) = model.apply(variables, last_label, (h, c),
                                      method=RNNTModel.predict_step)
            logits = model.apply(variables, enc_t, g,
                                 method=RNNTModel.joint_step)
            return logits, nh, nc

        b = batch_size
        l_, h_ = mcfg.decoder.pred_rnn_layers, mcfg.decoder.pred_hidden
        enc_args = (jax.ShapeDtypeStruct((b, t_samples), jnp.float32),
                    jax.ShapeDtypeStruct((b,), jnp.int32))
        dj_args = (jax.ShapeDtypeStruct((b, mcfg.encoder.d_model), jnp.float32),
                   jax.ShapeDtypeStruct((b,), jnp.int32),
                   jax.ShapeDtypeStruct((l_, b, h_), jnp.float32),
                   jax.ShapeDtypeStruct((l_, b, h_), jnp.float32))
        return {"encoder": (encoder, enc_args),
                "decoder_joint": (decoder_joint, dj_args)}

    def _decode_audio_batch(self, audio, lens, mode: str = "text"):
        from conformer_nemo_tpu.train.rnnt_trainer import make_rnnt_eval_step

        if mode == "logprobs":
            raise ValueError(
                "logprobs=True is CTC-only (the reference transducer "
                "transcribe has no logprobs kwarg, rnnt_models.py:218)")
        strategy = (self.raw_cfg["model"].get("decoding") or {}).get(
            "strategy", "greedy_batch")
        if strategy in ("greedy", "greedy_batch"):
            if self._eval_step is None:
                self._eval_step = make_rnnt_eval_step(
                    self.cfg, max_symbols=self._max_symbols)
            bd = {
                "audio": audio, "audio_lens": lens,
                "tokens": np.zeros((audio.shape[0], 8), np.int32),
                "token_lens": np.zeros((audio.shape[0],), np.int32),
            }
            if mode == "hypotheses":
                toks, tlens, steps = self._greedy_with_timestamps(audio, lens)
                return [
                    TranscriptionHypothesis(
                        score=0.0,
                        y_sequence=toks[i, : int(tlens[i])].tolist(),
                        text=self.tokenizer.ids_to_text(
                            toks[i, : int(tlens[i])].tolist()),
                        timestep=steps[i, : int(tlens[i])].tolist(),
                    )
                    for i in range(audio.shape[0])
                ]
            tokens, tlens, _ = self._eval_step(self.state, bd)
            toks = np.asarray(tokens)
            ids = [toks[i, : int(tlens[i])].tolist() for i in range(audio.shape[0])]
            return [self.tokenizer.ids_to_text(seq) for seq in ids]
        # beam family: encode then the RNNTDecoding facade
        from conformer_nemo_tpu.audio.features import log_mel_spectrogram
        from conformer_nemo_tpu.models.rnnt import RNNTModel

        dec = self._get_decoding()
        feats, fl = log_mel_spectrogram(
            self.cfg.preprocessor, jnp.asarray(audio, jnp.float32),
            jnp.asarray(lens, jnp.int32), training=False)
        enc, enc_lens = RNNTModel(self.cfg.model).apply(
            dec.variables, feats, fl, train=False, method=RNNTModel.encode)
        if mode == "hypotheses":
            id_lists = dec.decode(enc, enc_lens)
            return [
                TranscriptionHypothesis(
                    score=0.0, y_sequence=seq,
                    text=self.tokenizer.ids_to_text(seq))
                for seq in id_lists
            ]
        return dec.decode_to_text(enc, enc_lens)

    def save_portable(self, path: str, artifacts: Optional[dict] = None):
        save_portable(path, self.raw_cfg, self.portable_variables, artifacts)
