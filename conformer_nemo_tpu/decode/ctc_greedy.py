"""CTC greedy decoding.

Parity target: the reference's argmax + collapse-repeats-then-drop-blank rule
(`/root/reference/nemo/collections/asr/metrics/wer.py:127-186`).

The argmax runs on device inside the jitted eval step; the tiny
collapse/detokenize step is host-side Python (it produces ragged text).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def ctc_greedy_decode(log_probs: jnp.ndarray) -> jnp.ndarray:
    """[B, T, V+1] log-probs (or logits) -> argmax ids [B, T]."""
    return jnp.argmax(log_probs, axis=-1).astype(jnp.int32)


def collapse_ctc_ids(
    predictions: np.ndarray, lengths: np.ndarray | None, blank_id: int
) -> list[list[int]]:
    """Collapse repeats then drop blanks, per sample (wer.py:159-170)."""
    predictions = np.asarray(predictions)
    out = []
    for i in range(predictions.shape[0]):
        seq = predictions[i]
        if lengths is not None:
            seq = seq[: int(lengths[i])]
        decoded = []
        previous = blank_id
        for p in seq.tolist():
            if (p != previous or previous == blank_id) and p != blank_id:
                decoded.append(int(p))
            previous = p
        out.append(decoded)
    return out
