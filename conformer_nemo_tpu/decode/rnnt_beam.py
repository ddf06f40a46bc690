"""RNN-T beam search: default (ESPnet-style), TSD, ALSD, mAES.

Behavioral parity target: reference `BeamRNNTInfer`
(`/root/reference/nemo/collections/asr/parts/submodules/rnnt_beam_decoding.py`):
  * default (:465): score-ordered expansion per time step; beam_k non-blank
    candidates + blank; stop when `beam` kept hyps outscore the best open one.
  * tsd (:592): time-synchronous decoding (Saon et al. 2020) with
    `tsd_max_sym_exp` symmetric expansions per step and prefix recombination.
  * alsd (:712): alignment-length synchronous decoding, hyps synchronized on
    n = t + u, max target length `alsd_max_target_len` (float -> fraction of T).
  * maes (:896): modified adaptive expansion search (Kim et al. 2020) with
    prune-by-value gamma, per-step expansions, prefix-alpha LM-style prefix
    score merging.
  * score_norm: final sort by score / len(y_sequence) (:360-372).

Design: beam search is intrinsically hypothesis-ragged, so the search control
flow runs on host exactly like the reference; the hot leaf ops (prediction-net
step, joint) are jitted device calls batched over the live beam (the reference
scores one hypothesis at a time — batching the beam per step is the first
TPU win). States and scores live in numpy between steps.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Hypothesis:
    score: float
    y_sequence: List[int]
    dec_state: tuple  # (h [L,1,H], c [L,1,H]) numpy
    timestep: List[int]

    def key(self) -> tuple:
        return tuple(self.y_sequence)


def _sort_nbest(hyps: List[Hypothesis], score_norm: bool) -> List[Hypothesis]:
    if score_norm:
        return sorted(hyps, key=lambda x: x.score / max(len(x.y_sequence), 1), reverse=True)
    return sorted(hyps, key=lambda x: x.score, reverse=True)


def _logsumexp(a: float, b: float) -> float:
    m = max(a, b)
    return m + float(np.log(np.exp(a - m) + np.exp(b - m)))


def _recombine(hyps: List[Hypothesis]) -> List[Hypothesis]:
    """Merge hypotheses with identical label sequences (logsumexp scores)."""
    merged: dict = {}
    for h in hyps:
        k = h.key()
        if k in merged:
            merged[k].score = _logsumexp(merged[k].score, h.score)
        else:
            merged[k] = h
    return list(merged.values())


class BeamRNNTInfer:
    """Per-sample beam search over a jitted prednet/joint.

    model: RNNTModel; variables: flax variables dict.
    """

    def __init__(
        self,
        model,
        variables,
        beam_size: int = 4,
        search_type: str = "default",
        score_norm: bool = True,
        tsd_max_sym_exp: int = 50,
        alsd_max_target_len: float = 1.0,
        maes_num_steps: int = 2,
        maes_expansion_gamma: float = 2.3,
        maes_expansion_beta: int = 2,
        softmax_temperature: float = 1.0,
        return_best_hypothesis: bool = True,
    ):
        self.model = model
        self.variables = variables
        self.blank = model.cfg.blank_id
        self.vocab_size = model.cfg.decoder.vocab_size
        self.beam_size = max(1, min(beam_size, self.vocab_size))
        self.search_type = search_type
        self.score_norm = score_norm
        self.tsd_max_sym_exp = tsd_max_sym_exp
        self.alsd_max_target_len = alsd_max_target_len
        self.maes_num_steps = maes_num_steps
        self.maes_expansion_gamma = maes_expansion_gamma
        self.maes_expansion_beta = maes_expansion_beta
        self.temp = softmax_temperature
        self.return_best = return_best_hypothesis

        mdl_cls = type(model)
        self._pred_step = jax.jit(
            lambda lbl, st: model.apply(variables, lbl, st, method=mdl_cls.predict_step)
        )
        self._joint_logp = jax.jit(
            lambda e, g: jax.nn.log_softmax(
                model.apply(variables, e, g, method=mdl_cls.joint_step).astype(jnp.float32)
                / self.temp,
                axis=-1,
            )
        )
        self._zero_state = lambda n: jax.tree.map(
            np.asarray, model.apply(variables, n, method=mdl_cls.decoder_zero_state)
        )

    # -- leaf ops over a list of hypotheses (batched on device) -----------
    def _score_hyps(self, hyps: List[Hypothesis], cache: dict):
        """Prediction-net step for each hyp's last label; batched; cached."""
        missing = [h for h in hyps if h.key() not in cache]
        if missing:
            labels = np.array(
                [h.y_sequence[-1] if h.y_sequence else self.blank for h in missing], np.int32
            )
            states_h = np.concatenate([h.dec_state[0] for h in missing], axis=1)
            states_c = np.concatenate([h.dec_state[1] for h in missing], axis=1)
            g, (nh, nc) = self._pred_step(jnp.asarray(labels), (jnp.asarray(states_h), jnp.asarray(states_c)))
            g, nh, nc = np.asarray(g), np.asarray(nh), np.asarray(nc)
            for i, h in enumerate(missing):
                cache[h.key()] = (
                    g[i],
                    (nh[:, i : i + 1], nc[:, i : i + 1]),
                )
        return [cache[h.key()] for h in hyps]

    def _joint_many(self, enc_t: np.ndarray, gs: List[np.ndarray]) -> np.ndarray:
        """logp over V+1 for each g against one encoder frame. [N, V+1]."""
        g = np.stack(gs, axis=0)
        e = np.broadcast_to(enc_t[None, :], (g.shape[0], enc_t.shape[0]))
        return np.asarray(self._joint_logp(jnp.asarray(e), jnp.asarray(g)))

    # -- public API --------------------------------------------------------
    def __call__(self, enc: np.ndarray, enc_lens: np.ndarray):
        """enc [B, T, D], enc_lens [B] -> list of (best or nbest) per sample."""
        search = {
            "default": self.default_beam_search,
            "beam": self.default_beam_search,
            "tsd": self.time_sync_decoding,
            "alsd": self.align_length_sync_decoding,
            "maes": self.modified_adaptive_expansion_search,
        }[self.search_type]
        enc = np.asarray(enc)
        out = []
        for b in range(enc.shape[0]):
            t_len = int(enc_lens[b])
            nbest = search(enc[b, :t_len])
            nbest = _sort_nbest(nbest, self.score_norm)
            out.append(nbest[0] if self.return_best else nbest)
        return out

    def _init_hyp(self) -> Hypothesis:
        return Hypothesis(
            score=0.0, y_sequence=[], dec_state=self._zero_state(1), timestep=[]
        )

    # -- strategies --------------------------------------------------------
    def default_beam_search(self, enc: np.ndarray) -> List[Hypothesis]:
        """Score-ordered expansion (rnnt_beam_decoding.py:465-590)."""
        beam = self.beam_size
        beam_k = min(beam, self.vocab_size)
        cache: dict = {}
        kept = [self._init_hyp()]
        for t in range(enc.shape[0]):
            hyps = kept
            kept = []
            while True:
                max_hyp = max(hyps, key=lambda x: x.score)
                hyps.remove(max_hyp)
                (g, state) = self._score_hyps([max_hyp], cache)[0]
                logp = self._joint_many(enc[t], [g])[0]  # [V+1]
                # blank extension keeps the sequence, moves to next frame
                kept.append(
                    Hypothesis(
                        score=max_hyp.score + float(logp[self.blank]),
                        y_sequence=max_hyp.y_sequence[:],
                        dec_state=max_hyp.dec_state,
                        timestep=max_hyp.timestep[:],
                    )
                )
                # top-k non-blank extensions stay in the open set
                nb = np.delete(logp, self.blank)
                nb_ids = np.delete(np.arange(logp.shape[0]), self.blank)
                order = np.argsort(nb)[::-1][:beam_k]
                for j in order:
                    hyps.append(
                        Hypothesis(
                            score=max_hyp.score + float(nb[j]),
                            y_sequence=max_hyp.y_sequence + [int(nb_ids[j])],
                            dec_state=state,
                            timestep=max_hyp.timestep + [t],
                        )
                    )
                hyps_max = max(hyps, key=lambda x: x.score).score
                kept_best = [h for h in kept if h.score > hyps_max]
                if len(kept_best) >= beam:
                    kept = sorted(kept_best, key=lambda x: x.score, reverse=True)[:beam]
                    break
        return kept

    def time_sync_decoding(self, enc: np.ndarray) -> List[Hypothesis]:
        """TSD (rnnt_beam_decoding.py:592-710; Saon et al. 2020 Alg. 1)."""
        beam = self.beam_size
        cache: dict = {}
        B = [self._init_hyp()]
        for t in range(enc.shape[0]):
            A: List[Hypothesis] = []  # blank-terminated this frame
            C = B
            for v in range(self.tsd_max_sym_exp):
                if not C:
                    break
                D: List[Hypothesis] = []
                scored = self._score_hyps(C, cache)
                logps = self._joint_many(enc[t], [g for g, _ in scored])
                for i, h in enumerate(C):
                    # blank: finalize for this time step
                    A.append(
                        Hypothesis(
                            score=h.score + float(logps[i, self.blank]),
                            y_sequence=h.y_sequence[:],
                            dec_state=h.dec_state,
                            timestep=h.timestep[:],
                        )
                    )
                if v < self.tsd_max_sym_exp - 1:
                    for i, h in enumerate(C):
                        _, state = scored[i]
                        nb = np.delete(logps[i], self.blank)
                        nb_ids = np.delete(np.arange(logps.shape[1]), self.blank)
                        order = np.argsort(nb)[::-1][:beam]
                        for j in order:
                            D.append(
                                Hypothesis(
                                    score=h.score + float(nb[j]),
                                    y_sequence=h.y_sequence + [int(nb_ids[j])],
                                    dec_state=state,
                                    timestep=h.timestep + [t],
                                )
                            )
                C = sorted(_recombine(D), key=lambda x: x.score, reverse=True)[:beam]
            B = sorted(_recombine(A), key=lambda x: x.score, reverse=True)[:beam]
        return B

    def align_length_sync_decoding(self, enc: np.ndarray) -> List[Hypothesis]:
        """ALSD (rnnt_beam_decoding.py:712-894; Saon et al. 2020 Alg. 2).

        Hypotheses synchronized on n = t + u; t = n - len(y)."""
        beam = self.beam_size
        t_max = enc.shape[0]
        if isinstance(self.alsd_max_target_len, float):
            u_max = int(self.alsd_max_target_len * t_max)
        else:
            u_max = int(self.alsd_max_target_len)
        cache: dict = {}
        B = [self._init_hyp()]
        final: List[Hypothesis] = []
        for n in range(t_max + u_max):
            A: List[Hypothesis] = []
            B_ = []
            B_enc_t = []
            for h in B:
                t = n - len(h.y_sequence)
                if 0 <= t < t_max:
                    B_.append(h)
                    B_enc_t.append(t)
            if not B_:
                break
            scored = self._score_hyps(B_, cache)
            # joint per hyp against its own frame
            g = np.stack([s[0] for s in scored])
            e = np.stack([enc[t] for t in B_enc_t])
            logps = np.asarray(self._joint_logp(jnp.asarray(e), jnp.asarray(g)))
            for i, h in enumerate(B_):
                t = B_enc_t[i]
                blank_ext = Hypothesis(
                    score=h.score + float(logps[i, self.blank]),
                    y_sequence=h.y_sequence[:],
                    dec_state=h.dec_state,
                    timestep=h.timestep[:],
                )
                A.append(blank_ext)
                if t == t_max - 1:
                    final.append(blank_ext)
                _, state = scored[i]
                nb = np.delete(logps[i], self.blank)
                nb_ids = np.delete(np.arange(logps.shape[1]), self.blank)
                order = np.argsort(nb)[::-1][:beam]
                for j in order:
                    A.append(
                        Hypothesis(
                            score=h.score + float(nb[j]),
                            y_sequence=h.y_sequence + [int(nb_ids[j])],
                            dec_state=state,
                            timestep=h.timestep + [t],
                        )
                    )
            B = sorted(_recombine(A), key=lambda x: x.score, reverse=True)[:beam]
        return final if final else B

    def _prefix_merge(self, hyps: List[Hypothesis], enc_t: np.ndarray, cache: dict):
        """mAES prefix search (rnnt_beam_decoding.py:1134): when hyp_i's label
        sequence is a one-token prefix of hyp_j's, fold hyp_i's probability of
        completing into hyp_j into hyp_j's score. (Multi-token completions —
        maes_prefix_alpha > 1 — are approximated by repeated single-token
        merges across time steps.)"""
        for j, hj in enumerate(hyps):
            if not hj.y_sequence:
                continue
            for i, hi in enumerate(hyps):
                if i == j or len(hj.y_sequence) - len(hi.y_sequence) != 1:
                    continue
                if hj.y_sequence[:-1] != hi.y_sequence:
                    continue
                (g_i, _) = self._score_hyps([hi], cache)[0]
                logp = self._joint_many(enc_t, [g_i])[0]
                hj.score = _logsumexp(
                    hj.score, hi.score + float(logp[hj.y_sequence[-1]])
                )
        return hyps

    def modified_adaptive_expansion_search(self, enc: np.ndarray) -> List[Hypothesis]:
        """mAES (rnnt_beam_decoding.py:896-1110; Kim et al. 2020)."""
        beam = self.beam_size
        cache: dict = {}
        kept = [self._init_hyp()]
        for t in range(enc.shape[0]):
            hyps = self._prefix_merge(kept, enc[t], cache)
            for step in range(self.maes_num_steps):
                scored = self._score_hyps(hyps, cache)
                logps = self._joint_many(enc[t], [g for g, _ in scored])
                kept_new: List[Hypothesis] = []
                expanding: List[Hypothesis] = []
                for i, h in enumerate(hyps):
                    row = logps[i]
                    # prune-by-value: candidates within gamma of the best
                    thresh = float(row.max()) - self.maes_expansion_gamma
                    cand = np.where(row >= thresh)[0]
                    # cap expansions at beam + beta
                    if cand.shape[0] > beam + self.maes_expansion_beta:
                        cand = cand[np.argsort(row[cand])[::-1][: beam + self.maes_expansion_beta]]
                    for k in cand:
                        new = Hypothesis(
                            score=h.score + float(row[k]),
                            y_sequence=h.y_sequence[:],
                            dec_state=h.dec_state,
                            timestep=h.timestep[:],
                        )
                        if int(k) == self.blank:
                            kept_new.append(new)
                        else:
                            new.y_sequence.append(int(k))
                            new.timestep.append(t)
                            new.dec_state = scored[i][1]
                            expanding.append(new)
                if step == self.maes_num_steps - 1:
                    # force-finalize remaining expansions with their blank score
                    scored2 = self._score_hyps(expanding, cache) if expanding else []
                    if expanding:
                        logps2 = self._joint_many(enc[t], [g for g, _ in scored2])
                        for i, h in enumerate(expanding):
                            h.score += float(logps2[i, self.blank])
                            kept_new.append(h)
                    kept = sorted(_recombine(kept_new), key=lambda x: x.score, reverse=True)[:beam]
                    break
                if not expanding:
                    kept = sorted(_recombine(kept_new), key=lambda x: x.score, reverse=True)[:beam]
                    break
                hyps = sorted(_recombine(expanding), key=lambda x: x.score, reverse=True)[:beam]
                kept = sorted(_recombine(kept_new + kept), key=lambda x: x.score, reverse=True)[:beam] if kept_new else kept
        return kept
