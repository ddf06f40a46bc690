"""conformer_nemo_tpu — a TPU-native Conformer ASR framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of the
Conformer-NeMo reference stack (NeMo v1.8.2 fork): log-mel frontend,
SpecAugment (+ SpecShot), Conformer encoder, CTC and RNN-T training and
decoding, char/BPE/aggregate tokenizers, bucketed data pipelines, and
multi-host data-parallel training over a `jax.sharding.Mesh`.

Nothing here is a port: compute is expressed as static-shape jitted
functions (MXU-friendly matmuls, `lax.scan` recurrences, Pallas kernels
for the hot ops); the host side (IO, text, beam search) stays in
Python/C++.
"""

__version__ = "0.1.0"
