"""Batched greedy RNN-T decoding, fully on device.

Behavioral parity target: reference `GreedyBatchedRNNTInfer.
_greedy_decode_blank_as_pad` (`/root/reference/nemo/collections/asr/parts/
submodules/rnnt_greedy_decoding.py:453-616`): per time-step inner loop of at
most `max_symbols` label emissions; samples whose argmax is blank (or whose
length is exhausted) freeze their LSTM state and last label while the rest
continue; the time step advances when every sample has emitted blank.

TPU-first: the reference drives this loop from Python with per-iteration
`batch_copy_states` tensor surgery; here it is one `lax.fori_loop` over T
with a `lax.while_loop` inner loop — a single jitted program, no host round
trips, static [B, cap] token buffer (shapes stay compile-time constant).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def rnnt_greedy_decode_batched(
    model,
    variables,
    enc: jnp.ndarray,  # [B, T, D] encoder output (time-major last)
    enc_lens: jnp.ndarray,  # [B]
    *,
    max_symbols: int = 30,
    max_tokens: int | None = None,
    return_timestamps: bool = False,
):
    """Returns (tokens [B, cap] int32 padded with blank, token_lens [B]);
    with return_timestamps also the emission frame index per token
    [B, cap] int32 (the reference greedy decoders record `timestep` per
    emitted label, rnnt_greedy_decoding.py Hypothesis accumulation)."""
    b, t_max, _ = enc.shape
    blank = model.cfg.blank_id
    cap = max_tokens if max_tokens is not None else 2 * t_max

    def pred_step(last_label, state):
        return model.apply(variables, last_label, state, method=type(model).predict_step)

    def joint_step(enc_t, g):
        return model.apply(variables, enc_t, g, method=type(model).joint_step)

    state0 = model.apply(variables, b, method=type(model).decoder_zero_state)
    last_label0 = jnp.full((b,), blank, jnp.int32)
    tokens0 = jnp.full((b, cap), blank, jnp.int32)
    steps0 = jnp.zeros((b, cap), jnp.int32)
    lens0 = jnp.zeros((b,), jnp.int32)

    def time_step(t, carry):
        last_label, state, tokens, steps, lens = carry
        f = jax.lax.dynamic_slice_in_dim(enc, t, 1, axis=1)[:, 0]  # [B, D]
        exhausted = t >= enc_lens  # [B]

        def cond(inner):
            sym, blank_mask, *_ = inner
            return (sym < max_symbols) & jnp.any(~blank_mask)

        def body(inner):
            sym, blank_mask, last_label, state, tokens, steps, lens = inner
            g, new_state = pred_step(last_label, state)
            logits = joint_step(f, g)  # [B, V+1]
            k = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            is_blank = k == blank
            advance = (~blank_mask) & (~is_blank)  # samples that emit a label
            # write token at position lens (dropped if buffer full)
            write_pos = jnp.clip(lens, 0, cap - 1)
            onehot = (jnp.arange(cap)[None, :] == write_pos[:, None]) & advance[:, None] & (lens < cap)[:, None]
            tokens = jnp.where(onehot, k[:, None], tokens)
            steps = jnp.where(onehot, t, steps)
            lens = jnp.minimum(lens + advance.astype(jnp.int32), cap)
            last_label = jnp.where(advance, k, last_label)
            state = jax.tree.map(
                lambda new, old: jnp.where(advance[None, :, None], new, old), new_state, state
            )
            blank_mask = blank_mask | is_blank
            return (sym + 1, blank_mask, last_label, state, tokens, steps, lens)

        init = (jnp.int32(0), exhausted, last_label, state, tokens, steps, lens)
        _, _, last_label, state, tokens, steps, lens = jax.lax.while_loop(cond, body, init)
        return (last_label, state, tokens, steps, lens)

    _, _, tokens, steps, lens = jax.lax.fori_loop(
        0, t_max, time_step, (last_label0, state0, tokens0, steps0, lens0)
    )
    if return_timestamps:
        return tokens, lens, steps
    return tokens, lens


def make_rnnt_greedy_decoder(model, max_symbols: int = 30, max_tokens: int | None = None):
    """Jitted (variables, features [B,D,T], feat_lens) -> (tokens, lens)
    running the encoder + greedy loop in one program."""

    @jax.jit
    def decode(variables, features, feat_lens):
        enc, enc_lens = model.apply(
            variables, features, feat_lens, train=False, method=type(model).encode
        )
        return rnnt_greedy_decode_batched(
            model, variables, enc, enc_lens, max_symbols=max_symbols, max_tokens=max_tokens
        )

    return decode
