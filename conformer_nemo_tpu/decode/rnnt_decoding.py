"""RNN-T decoding facade: strategy config -> decoder -> text.

Parity target: reference `RNNTDecoding` / `AbstractRNNTDecoding`
(`/root/reference/nemo/collections/asr/metrics/rnnt_wer.py:116-370`): maps
cfg.strategy in {greedy, greedy_batch, beam, tsd, alsd, maes} to an inference
object and detokenizes hypotheses. Adds `beam_batch` — a fully-jitted
device-batched beam (decode/rnnt_beam_batched.py) the reference has no
analogue for.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from conformer_nemo_tpu.decode.rnnt_beam import BeamRNNTInfer
from conformer_nemo_tpu.decode.rnnt_greedy import rnnt_greedy_decode_batched


class RNNTDecoding:
    """cfg: reference-shaped `decoding` dict (configs/conformer_transducer_bpe.yaml
    decoding section)."""

    def __init__(self, model, variables, tokenizer, cfg: Optional[dict] = None):
        cfg = cfg or {}
        self.model = model
        self.variables = variables
        self.tokenizer = tokenizer
        self.strategy = cfg.get("strategy", "greedy_batch")
        greedy_cfg = cfg.get("greedy") or {}
        self.max_symbols = int(greedy_cfg.get("max_symbols", 10) or 10)
        # reference greedy/beam `preserve_alignments` knob
        # (rnnt_greedy_decoding.py): keep per-token emission frames
        self.preserve_alignments = bool(greedy_cfg.get("preserve_alignments", False))
        beam_cfg = cfg.get("beam") or {}
        self._beam_cfg = beam_cfg
        self._beam = None
        if self.strategy in ("beam", "tsd", "alsd", "maes"):
            self._beam = BeamRNNTInfer(
                model, variables,
                beam_size=int(beam_cfg.get("beam_size", 2)),
                search_type="default" if self.strategy == "beam" else self.strategy,
                score_norm=bool(beam_cfg.get("score_norm", True)),
                tsd_max_sym_exp=int(beam_cfg.get("tsd_max_sym_exp", 50)),
                alsd_max_target_len=beam_cfg.get("alsd_max_target_len", 1.0),
                return_best_hypothesis=bool(beam_cfg.get("return_best_hypothesis", True)),
                # maes knobs (reference rnnt_beam_decoding.py:205-215)
                maes_num_steps=int(beam_cfg.get("maes_num_steps", 2)),
                maes_expansion_gamma=float(beam_cfg.get("maes_expansion_gamma", 2.3)),
                maes_expansion_beta=int(beam_cfg.get("maes_expansion_beta", 2)),
                softmax_temperature=float(beam_cfg.get("softmax_temperature", 1.0)),
            )

    def decode(self, enc, enc_lens) -> List[List[int]]:
        """encoder output [B, T, D] + lens -> list of token-id lists. With
        preserve_alignments, per-call alignments (emission frame per token)
        are stored on `self.last_alignments`."""
        self.last_alignments = None
        if self.strategy in ("greedy", "greedy_batch"):
            out = rnnt_greedy_decode_batched(
                self.model, self.variables, jnp.asarray(enc), jnp.asarray(enc_lens),
                max_symbols=self.max_symbols,
                return_timestamps=self.preserve_alignments,
            )
            if self.preserve_alignments:
                tokens, lens, steps = out
                st = np.asarray(steps)
                self.last_alignments = [
                    st[i, : int(lens[i])].tolist() for i in range(st.shape[0])]
            else:
                tokens, lens = out
            toks = np.asarray(tokens)
            return [toks[i, : int(lens[i])].tolist() for i in range(toks.shape[0])]
        if self.strategy == "beam_batch":
            from conformer_nemo_tpu.decode.rnnt_beam_batched import (
                rnnt_beam_batched_decode)

            tokens, lens = rnnt_beam_batched_decode(
                self.model, self.variables, jnp.asarray(enc),
                jnp.asarray(enc_lens),
                beam_size=int(self._beam_cfg.get("beam_size", 4)),
                max_sym_exp=int(self._beam_cfg.get("tsd_max_sym_exp", 2) or 2),
                score_norm=bool(self._beam_cfg.get("score_norm", True)),
            )
            toks = np.asarray(tokens)
            return [toks[i, : int(lens[i])].tolist() for i in range(toks.shape[0])]
        hyps = self._beam(np.asarray(enc), np.asarray(enc_lens))
        out = []
        for h in hyps:
            best = h if not isinstance(h, list) else h[0]
            out.append(list(best.y_sequence))
        return out

    def decode_to_text(self, enc, enc_lens) -> List[str]:
        return [self.tokenizer.ids_to_text(ids) for ids in self.decode(enc, enc_lens)]
