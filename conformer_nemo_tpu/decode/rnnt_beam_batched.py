"""Fully-jitted batched RNN-T beam search (strategy: `beam_batch`).

One XLA program decodes the whole batch with K live hypotheses per sample —
the beam analogue of `greedy_batch` (decode/rnnt_greedy.py). Semantics follow
time-synchronous decoding (reference BeamRNNTInfer tsd, Saon et al. 2020,
rnnt_beam_decoding.py:592): at every encoder frame each hypothesis makes up
to `max_sym_exp` label expansions; emitting blank closes the hypothesis for
this frame. Hypothesis-prefix recombination is NOT performed on device (the
reference's `recombine_hypotheses`:1111 is a host-side dict-merge; dropping
it costs a small amount of search quality, never correctness of the best
path kept).

TPU-first: everything is static-shape — the beam [B, K], the token buffer
[B, K, cap], prediction-net states [L, B, K, H]; per-frame candidate
selection is `lax.top_k` over K*V candidates and parent gathers over the
tiny K axis. Under a data-sharded mesh the batch axis shards and XLA inserts
the collectives (there is no cross-sample communication, so it scales
embarrassingly).

Exposed through RNNTDecoding (decode/rnnt_decoding.py) as
`strategy: beam_batch` with `beam.beam_size` / `beam.tsd_max_sym_exp` /
`beam.score_norm` honored.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def rnnt_beam_batched_decode(
    model,
    variables,
    enc: jnp.ndarray,  # [B, T, D]
    enc_lens: jnp.ndarray,  # [B]
    *,
    beam_size: int = 4,
    max_sym_exp: int = 2,
    score_norm: bool = True,
    max_tokens: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (tokens [B, cap] int32 blank-padded, token_lens [B]) of the best
    hypothesis per sample."""
    b, t_max, _ = enc.shape
    k = beam_size
    blank = model.cfg.blank_id
    v_total = model.cfg.num_classes_with_blank
    cap = max_tokens if max_tokens is not None else min(2 * t_max, 512)
    h_layers = model.cfg.decoder.pred_rnn_layers
    h_dim = model.cfg.decoder.pred_hidden

    def pred_step(labels_flat, state):
        return model.apply(variables, labels_flat, state,
                           method=type(model).predict_step)

    def joint_step(enc_flat, g_flat):
        return model.apply(variables, enc_flat, g_flat,
                           method=type(model).joint_step)

    neg_inf = jnp.float32(-1e30)

    # init: hypothesis 0 is the empty hyp; others dead (-inf)
    scores0 = jnp.full((b, k), neg_inf).at[:, 0].set(0.0)
    tokens0 = jnp.full((b, k, cap), blank, jnp.int32)
    tlen0 = jnp.zeros((b, k), jnp.int32)
    h0 = jnp.zeros((h_layers, b, k, h_dim), jnp.float32)
    c0 = jnp.zeros_like(h0)
    sos = jnp.full((b * k,), blank, jnp.int32)
    g0_flat, _ = pred_step(sos, (h0.reshape(h_layers, b * k, h_dim),
                                 c0.reshape(h_layers, b * k, h_dim)))
    g0 = g0_flat.reshape(b, k, -1)

    def gather_k(x, idx):
        """x [..., B, K, ...] gather over the K axis with idx [B, K]."""
        if x.ndim == 3:  # [B, K, X]
            return jnp.take_along_axis(x, idx[:, :, None], axis=1)
        if x.ndim == 2:  # [B, K]
            return jnp.take_along_axis(x, idx, axis=1)
        if x.ndim == 4 and x.shape[0] == h_layers:  # [L, B, K, H]
            return jnp.take_along_axis(x, idx[None, :, :, None], axis=2)
        raise ValueError(x.shape)

    def frame_body(t, carry):
        scores, tokens, tlen, h, c, g = carry
        enc_t = enc[:, t, :]  # [B, D]
        enc_rep = jnp.broadcast_to(enc_t[:, None, :],
                                   (b, k, enc_t.shape[-1]))

        # done pool: hyps that already emitted blank this frame
        d_scores = jnp.full((b, k), neg_inf)
        d_tokens, d_tlen, d_h, d_c, d_g = tokens, tlen, h, c, g

        a_scores, a_tokens, a_tlen, a_h, a_c, a_g = (
            scores, tokens, tlen, h, c, g)

        def merge_done(ds, dt, dl, dh, dc, dg, ns, nt, nl, nh, nc, ng):
            """top-K of the union of two K-pools (scores + payload)."""
            cat = lambda x, y, ax: jnp.concatenate([x, y], axis=ax)
            s2 = cat(ds, ns, 1)  # [B, 2K]
            top, idx = jax.lax.top_k(s2, k)  # idx in [0, 2K)
            t2 = jnp.take_along_axis(cat(dt, nt, 1), idx[:, :, None], axis=1)
            l2 = jnp.take_along_axis(cat(dl, nl, 1), idx, axis=1)
            h2 = jnp.take_along_axis(cat(dh, nh, 2), idx[None, :, :, None], axis=2)
            c2 = jnp.take_along_axis(cat(dc, nc, 2), idx[None, :, :, None], axis=2)
            g2 = jnp.take_along_axis(cat(dg, ng, 1), idx[:, :, None], axis=1)
            return top, t2, l2, h2, c2, g2

        for e in range(max_sym_exp):
            logits = joint_step(enc_rep.reshape(b * k, -1),
                                a_g.reshape(b * k, -1))
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            logp = logp.reshape(b, k, v_total)

            # blank closes the frame for this hypothesis
            closed = a_scores + logp[:, :, blank]
            (d_scores, d_tokens, d_tlen, d_h, d_c, d_g) = merge_done(
                d_scores, d_tokens, d_tlen, d_h, d_c, d_g,
                closed, a_tokens, a_tlen, a_h, a_c, a_g)

            if e == max_sym_exp - 1:
                break

            # label expansions: top-K over K*V label candidates
            full = a_tlen >= cap  # capped hyps can't grow
            lab_sc = a_scores[:, :, None] + logp[:, :, :blank]
            lab_sc = jnp.where(full[:, :, None], neg_inf, lab_sc)
            flat = lab_sc.reshape(b, k * blank)
            top, idx = jax.lax.top_k(flat, k)
            parent = idx // blank  # [B, K]
            label = idx % blank

            p_tokens = gather_k(a_tokens, parent)
            p_tlen = gather_k(a_tlen, parent)
            p_h = gather_k(a_h, parent)
            p_c = gather_k(a_c, parent)
            # append label at position tlen (no scatter: iota mask)
            pos = jax.lax.broadcasted_iota(jnp.int32, (b, k, cap), 2)
            n_tokens = jnp.where(pos == p_tlen[:, :, None],
                                 label[:, :, None], p_tokens)
            n_tlen = jnp.minimum(p_tlen + 1, cap)

            ng_flat, (nh_flat, nc_flat) = pred_step(
                label.reshape(b * k),
                (p_h.reshape(h_layers, b * k, h_dim),
                 p_c.reshape(h_layers, b * k, h_dim)))
            a_scores, a_tokens, a_tlen = top, n_tokens, n_tlen
            a_h = nh_flat.reshape(h_layers, b, k, h_dim)
            a_c = nc_flat.reshape(h_layers, b, k, h_dim)
            a_g = ng_flat.reshape(b, k, -1)

        # past the valid length the frame is a no-op
        active = (t < enc_lens)[:, None]
        out = []
        for new, old in ((d_scores, scores), (d_tokens, tokens),
                         (d_tlen, tlen)):
            shape_mask = active.reshape((b, 1) + (1,) * (new.ndim - 2))
            out.append(jnp.where(shape_mask, new, old))
        n_h = jnp.where(active[None, :, :, None], d_h, h)
        n_c = jnp.where(active[None, :, :, None], d_c, c)
        n_g = jnp.where(active[:, :, None], d_g, g)
        return (out[0], out[1], out[2], n_h, n_c, n_g)

    carry = (scores0, tokens0, tlen0, h0, c0, g0)
    scores, tokens, tlen, _, _, _ = jax.lax.fori_loop(
        0, t_max, frame_body, carry)

    final = scores
    if score_norm:
        final = scores / jnp.maximum(tlen.astype(jnp.float32), 1.0)
    best = jnp.argmax(final, axis=1)  # [B]
    best_tokens = jnp.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0]
    best_len = jnp.take_along_axis(tlen, best[:, None], axis=1)[:, 0]
    return best_tokens, best_len
