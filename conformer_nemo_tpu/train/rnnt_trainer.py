"""RNN-T training/eval steps.

Parity target: reference `EncDecRNNTModel.training_step`
(`/root/reference/nemo/collections/asr/models/rnnt_models.py:673-739`), with
the fused joint+loss path and optional variational noise on decoder grads
(`on_after_backward`, rnnt_models.py:889-930).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from conformer_nemo_tpu.audio.features import log_mel_spectrogram
from conformer_nemo_tpu.audio.spec_augment import apply_spectrogram_augmentation
from conformer_nemo_tpu.decode.rnnt_greedy import rnnt_greedy_decode_batched
from conformer_nemo_tpu.models.rnnt import RNNTModel, RNNTModelConfig
from conformer_nemo_tpu.audio.features import MelFeatureConfig
from conformer_nemo_tpu.audio.spec_augment import SpecAugmentConfig
from conformer_nemo_tpu.train.trainer import TrainState, fast_mask_rng


import dataclasses


@dataclasses.dataclass(frozen=True)
class RNNTTrainConfig:
    preprocessor: MelFeatureConfig = MelFeatureConfig()
    spec_augment: SpecAugmentConfig = SpecAugmentConfig()
    model: RNNTModelConfig = RNNTModelConfig()
    variational_noise_std: float = 0.0
    variational_noise_start: int = 0


def init_rnnt_state(
    cfg: RNNTTrainConfig,
    optimizer: optax.GradientTransformation,
    rng: jax.Array,
    example_feat_shape=(1, 80, 128),
) -> TrainState:
    model = RNNTModel(cfg.model)
    feats = jnp.zeros(example_feat_shape, jnp.float32)
    lens = jnp.full((example_feat_shape[0],), example_feat_shape[-1], jnp.int32)
    targets = jnp.zeros((example_feat_shape[0], 4), jnp.int32)
    tlens = jnp.full((example_feat_shape[0],), 4, jnp.int32)
    variables = model.init(rng, feats, lens, targets, tlens, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict({}))
    opt_state = optimizer.init(params)
    return TrainState.create(params, batch_stats, opt_state, rng)


def make_rnnt_train_step(
    cfg: RNNTTrainConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    state_template: Optional[TrainState] = None,
    skip_nan_grad: bool = False,
) -> Callable:
    model = RNNTModel(cfg.model)

    def loss_fn(params, batch_stats, batch, rng):
        feat_rng, aug_rng, drop_rng = map(
            fast_mask_rng, jax.random.split(rng, 3))
        feats, feat_lens = log_mel_spectrogram(
            cfg.preprocessor, batch["audio"], batch["audio_lens"], rng=feat_rng, training=True
        )
        if cfg.spec_augment.enabled:
            feats = apply_spectrogram_augmentation(cfg.spec_augment, aug_rng, feats, feat_lens)
        has_stats = bool(batch_stats)
        variables = {"params": params}
        if has_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(
            variables, feats, feat_lens, batch["tokens"], batch["token_lens"],
            train=True, rngs={"dropout": drop_rng},
            mutable=["batch_stats"] if has_stats else False,
        )
        if has_stats:
            nll, updates = out
            new_stats = updates.get("batch_stats", batch_stats)
        else:
            nll, new_stats = out, batch_stats
        valid = (batch["audio_lens"] > 0).astype(jnp.float32)
        loss = jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        return loss, new_stats

    def step_fn(state: TrainState, batch):
        rng, noise_rng, new_rng = jax.random.split(state.rng, 3)
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng
        )
        if cfg.variational_noise_std > 0:
            # Gaussian noise on decoder (prediction net) grads only
            # (rnnt_models.py:904-930).
            active = state.step >= cfg.variational_noise_start

            def add_noise(path, g):
                if path and path[0] == "decoder":
                    noise = cfg.variational_noise_std * jax.random.normal(
                        jax.random.fold_in(noise_rng, abs(hash(path)) % (2 ** 31)),
                        g.shape, g.dtype,
                    )
                    return g + jnp.where(active, 1.0, 0.0) * noise
                return g

            grads = _map_with_path(add_noise, grads)
        gnorm = optax.global_norm(grads)
        if skip_nan_grad:
            finite = jnp.isfinite(gnorm)
            grads = jax.tree.map(lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
            updates, maybe_opt = optimizer.update(grads, state.opt_state, state.params)
            new_opt_state = jax.tree.map(
                lambda new, old: jnp.where(finite, new, old), maybe_opt, state.opt_state
            )
            updates = jax.tree.map(lambda u: jnp.where(finite, u, jnp.zeros_like(u)), updates)
        else:
            updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # per-module grad norms (reference logs encoder/decoder/joint norms
        # for prednet-blowup diagnosis, rnnt_models.py:889-930)
        metrics = {"loss": loss, "grad_norm": gnorm}
        for mod in ("encoder", "decoder", "joint"):
            if mod in grads:
                metrics[f"{mod}_grad_norm"] = optax.global_norm(grads[mod])
        return (
            state.replace(
                step=state.step + 1, params=new_params, batch_stats=new_stats,
                opt_state=new_opt_state, rng=new_rng,
            ),
            metrics,
        )

    if mesh is not None:
        batch_sh = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        shardings = {k: batch_sh for k in ("audio", "audio_lens", "tokens", "token_lens")}
        if state_template is not None and mesh.shape.get("model", 1) > 1:
            from conformer_nemo_tpu.parallel.sharding import state_shardings

            st_sh = state_shardings(mesh, state_template)
        else:
            st_sh = rep
        return jax.jit(
            step_fn, in_shardings=(st_sh, shardings), out_shardings=(st_sh, None),
            donate_argnums=(0,),
        )
    return jax.jit(step_fn, donate_argnums=(0,))


def _map_with_path(fn, tree):
    import jax.tree_util as jtu

    def conv(path):
        out = []
        for p in path:
            if isinstance(p, jtu.DictKey):
                out.append(str(p.key))
            else:
                out.append(str(p))
        return tuple(out)

    return jtu.tree_map_with_path(lambda path, g: fn(conv(path), g), tree)


def make_rnnt_eval_step(cfg: RNNTTrainConfig, max_symbols: int = 10) -> Callable:
    """Jitted eval: (state, batch) -> (tokens, token_lens, enc_lens)."""
    model = RNNTModel(cfg.model)

    @jax.jit
    def eval_fn(state: TrainState, batch):
        feats, feat_lens = log_mel_spectrogram(
            cfg.preprocessor, batch["audio"], batch["audio_lens"], training=False
        )
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        enc, enc_lens = model.apply(
            variables, feats, feat_lens, train=False, method=RNNTModel.encode
        )
        tokens, lens = rnnt_greedy_decode_batched(
            model, variables, enc, enc_lens, max_symbols=max_symbols
        )
        return tokens, lens, enc_lens

    return eval_fn


def make_rnnt_loss_eval_step(cfg: RNNTTrainConfig) -> Callable:
    """Jitted deterministic transducer loss for validation — built only when
    `compute_eval_loss` is set (reference rnnt_models.py compute_eval_loss
    flag / conformer_transducer_bpe.yaml:27: off by default because the
    [B,T,U,V] joint on long eval utterances is memory-hungry)."""
    model = RNNTModel(cfg.model)

    @jax.jit
    def loss_fn(state: TrainState, batch):
        feats, feat_lens = log_mel_spectrogram(
            cfg.preprocessor, batch["audio"], batch["audio_lens"], training=False
        )
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        nll = model.apply(
            variables, feats, feat_lens, batch["tokens"], batch["token_lens"],
            train=False,
        )
        valid = (batch["audio_lens"] > 0).astype(jnp.float32)
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    return loss_fn


def evaluate_rnnt_wer(cfg: RNNTTrainConfig, state, loader, tokenizer, eval_step=None,
                      use_cer=False, loss_step=None):
    from conformer_nemo_tpu.decode.wer import wer_num_denom

    if eval_step is None:
        eval_step = make_rnnt_eval_step(cfg)
    tot_e, tot_w = 0, 0
    tot_loss, n_batches = 0.0, 0
    for batch in loader:
        bd = {
            "audio": batch.audio, "audio_lens": batch.audio_lens,
            "tokens": batch.tokens, "token_lens": batch.token_lens,
        }
        if loss_step is not None:
            tot_loss += float(loss_step(state, bd))
            n_batches += 1
        tokens, lens, _ = eval_step(state, bd)
        n_valid = int((batch.audio_lens > 0).sum())
        import numpy as np

        toks = np.asarray(tokens)
        hyps = [
            tokenizer.ids_to_text(toks[i, : int(lens[i])].tolist()) for i in range(n_valid)
        ]
        refs = batch.texts[:n_valid]
        e, w = wer_num_denom(hyps, refs, use_cer)
        tot_e += e
        tot_w += w
    out = {"wer": tot_e / max(tot_w, 1), "edits": tot_e, "words": tot_w}
    if n_batches:
        out["loss"] = tot_loss / n_batches
    return out
