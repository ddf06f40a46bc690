"""CTC training loop: jitted sharded train/eval steps + a thin fit() driver.

Replaces the reference's PyTorch-Lightning stack (`ModelPT` +
`EncDecCTCModel.training_step`, `/root/reference/nemo/collections/asr/models/
ctc_models.py:599-630`) with the TPU idiom: a TrainState pytree, one
`jax.jit`-compiled step with NamedSharding-annotated inputs (batch sharded
over the mesh 'data' axis, params replicated), gradient psum inserted by XLA,
and host-side orchestration kept to data loading + logging + checkpoints.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from conformer_nemo_tpu.decode.ctc_greedy import collapse_ctc_ids, ctc_greedy_decode
from conformer_nemo_tpu.decode.wer import wer_num_denom
from conformer_nemo_tpu.models.ctc_model import (
    CTCModel,
    CTCModelConfig,
    ctc_model_loss,
)
from conformer_nemo_tpu.audio.features import log_mel_spectrogram
from conformer_nemo_tpu.audio.spec_augment import apply_spectrogram_augmentation


def fast_mask_rng(key: jax.Array) -> jax.Array:
    """Convert a threefry key to an rbg-backed key for bulk mask generation.

    Dropout/dither masks are tens of MB per step; generating them with the
    default threefry PRNG costs ~25% of the CTC-large train step on a v5e
    (170 -> 130 ms measured when switched to XLA's RngBitGenerator). The
    TrainState keeps a threefry key for stable stream semantics/serialization;
    only the per-step derived keys are converted. Statistical quality of rbg
    is ample for dropout (see jax.random 'rbg' docs)."""
    data = jax.random.key_data(key).reshape(-1)[:2]
    return jax.random.wrap_key_data(
        jnp.concatenate([data, data]), impl="rbg")


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array

    @classmethod
    def create(cls, params, batch_stats, opt_state, rng):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            rng=rng,
        )


def init_ctc_state(
    cfg: CTCModelConfig,
    optimizer: optax.GradientTransformation,
    rng: jax.Array,
    example_feat_shape=(1, 80, 128),
) -> TrainState:
    model = CTCModel(cfg)
    feats = jnp.zeros(example_feat_shape, jnp.float32)
    lens = jnp.full((example_feat_shape[0],), example_feat_shape[-1], jnp.int32)
    variables = model.init(rng, feats, lens, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict({}))
    opt_state = optimizer.init(params)
    return TrainState.create(params, batch_stats, opt_state, rng)


def make_ctc_train_step(
    cfg: CTCModelConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    state_template: Optional[TrainState] = None,
    skip_nan_grad: bool = False,
) -> Callable:
    """Returns jitted step(state, batch_dict) -> (state, metrics).

    With a mesh, the batch is sharded over 'data'. If the mesh has a 'model'
    axis > 1 and a state_template is given, encoder params/moments get
    tensor-parallel shardings (parallel/sharding.py) — XLA splits the matmuls
    and inserts the collectives."""

    def loss_fn(params, batch_stats, batch, rng):
        feat_rng, aug_rng, drop_rng = map(
            fast_mask_rng, jax.random.split(rng, 3))
        feats, feat_lens = log_mel_spectrogram(
            cfg.preprocessor, batch["audio"], batch["audio_lens"], rng=feat_rng, training=True
        )
        if cfg.spec_augment.enabled:
            feats = apply_spectrogram_augmentation(cfg.spec_augment, aug_rng, feats, feat_lens)
        model = CTCModel(cfg)
        has_stats = bool(batch_stats)
        variables = {"params": params}
        if has_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(
            variables, feats, feat_lens, train=True,
            rngs={"dropout": drop_rng},
            mutable=["batch_stats"] if has_stats else False,
        )
        if has_stats:
            (log_probs, enc_lens), updates = out
            new_stats = updates.get("batch_stats", batch_stats)
        else:
            log_probs, enc_lens = out
            new_stats = batch_stats
        valid = (batch["audio_lens"] > 0).astype(jnp.float32)
        loss = ctc_model_loss(
            cfg, log_probs, enc_lens, batch["tokens"], batch["token_lens"], valid
        )
        return loss, new_stats

    def step_fn(state: TrainState, batch):
        rng, new_rng = jax.random.split(state.rng)
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng
        )
        gnorm = optax.global_norm(grads)
        if skip_nan_grad:
            # reference skip_nan_grad semantics (configs/conformer_ctc_bpe.yaml:33,
            # rnnt_models maybe_skip): zero the whole update when any grad is
            # non-finite, leaving params and optimizer state untouched.
            finite = jnp.isfinite(gnorm)
            grads = jax.tree.map(lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
            updates, maybe_opt_state = optimizer.update(grads, state.opt_state, state.params)
            new_opt_state = jax.tree.map(
                lambda new, old: jnp.where(finite, new, old), maybe_opt_state, state.opt_state
            )
            updates = jax.tree.map(lambda u: jnp.where(finite, u, jnp.zeros_like(u)), updates)
            new_params = optax.apply_updates(state.params, updates)
        else:
            updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": gnorm}
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            rng=new_rng,
        )
        return new_state, metrics

    if mesh is not None:
        batch_sh = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        batch_shardings = {
            "audio": batch_sh, "audio_lens": batch_sh,
            "tokens": batch_sh, "token_lens": batch_sh,
        }
        if state_template is not None and mesh.shape.get("model", 1) > 1:
            from conformer_nemo_tpu.parallel.sharding import state_shardings

            st_sh = state_shardings(mesh, state_template)
        else:
            st_sh = rep
        return jax.jit(
            step_fn,
            in_shardings=(st_sh, batch_shardings),
            out_shardings=(st_sh, None),
            donate_argnums=(0,),
        )
    return jax.jit(step_fn, donate_argnums=(0,))


def make_ctc_eval_step(cfg: CTCModelConfig) -> Callable:
    """Returns jitted eval(state, batch) -> (loss, greedy_ids, enc_lens)."""

    def eval_fn(state: TrainState, batch):
        feats, feat_lens = log_mel_spectrogram(
            cfg.preprocessor, batch["audio"], batch["audio_lens"], training=False
        )
        model = CTCModel(cfg)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        log_probs, enc_lens = model.apply(variables, feats, feat_lens, train=False)
        valid = (batch["audio_lens"] > 0).astype(jnp.float32)
        # scan impl: forward-only CTC is faster than the fwd+bwd-optimized kernel
        loss = ctc_model_loss(
            cfg, log_probs, enc_lens, batch["tokens"], batch["token_lens"], valid,
            impl="scan",
        )
        preds = ctc_greedy_decode(log_probs)
        return loss, preds, enc_lens

    return jax.jit(eval_fn)


def evaluate_wer(
    cfg: CTCModelConfig, state: TrainState, loader, tokenizer, eval_step=None,
    use_cer: bool = False,
) -> dict:
    """Full-dataset WER: device greedy decode, host detokenize + levenshtein.

    Aggregation matches the reference's sum(num)/sum(denom) across batches
    (asr_model.py:40-52)."""
    if eval_step is None:
        eval_step = make_ctc_eval_step(cfg)
    tot_edits, tot_words, tot_loss, n_batches = 0, 0, 0.0, 0
    example = None  # (reference, prediction) pair — log_prediction parity (wer.py:252)
    for batch in loader:
        bd = {
            "audio": batch.audio, "audio_lens": batch.audio_lens,
            "tokens": batch.tokens, "token_lens": batch.token_lens,
        }
        loss, preds, enc_lens = eval_step(state, bd)
        n_valid = int((batch.audio_lens > 0).sum())
        id_lists = collapse_ctc_ids(preds, enc_lens, cfg.blank_id)[:n_valid]
        hyps = [tokenizer.ids_to_text(ids) for ids in id_lists]
        refs = batch.texts[:n_valid]
        e, w = wer_num_denom(hyps, refs, use_cer)
        tot_edits += e
        tot_words += w
        tot_loss += float(loss)
        n_batches += 1
        if example is None and refs:
            example = (refs[0], hyps[0])
    return {
        "wer": tot_edits / max(tot_words, 1),
        "loss": tot_loss / max(n_batches, 1),
        "edits": tot_edits,
        "words": tot_words,
        "example": example,
    }
