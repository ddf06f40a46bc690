"""Pallas CTC kernels: interpret-mode parity vs the scan implementation
(which itself is torch-parity-tested)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from conformer_nemo_tpu.ops.ctc_loss import ctc_forward_neg_log_likelihood
from conformer_nemo_tpu.ops.pallas.ctc_kernel import ctc_loss_pallas


def make_case(b=4, t=20, v=6, u=5, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, t, v + 1).astype(np.float32)
    log_probs = torch.log_softmax(torch.from_numpy(logits), dim=-1).numpy()
    targets = rng.randint(0, v, size=(b, u)).astype(np.int32)
    il = np.array([t, t - 5, t - 9, t], dtype=np.int32)[:b]
    tl = np.array([u, u - 2, u - 4, 0], dtype=np.int32)[:b]
    return jnp.asarray(log_probs), targets, il, tl, v


def test_pallas_forward_matches_scan():
    lp, targets, il, tl, v = make_case()
    ref = np.asarray(ctc_forward_neg_log_likelihood(lp, targets, il, tl, v))
    ours = np.asarray(ctc_loss_pallas(lp, targets, il, tl, v, True))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_pallas_gradient_matches_scan():
    lp, targets, il, tl, v = make_case(seed=1)

    def f_scan(x):
        return jnp.sum(ctc_forward_neg_log_likelihood(x, targets, il, tl, v))

    def f_pallas(x):
        return jnp.sum(ctc_loss_pallas(x, targets, il, tl, v, True))

    g_ref = np.asarray(jax.grad(f_scan)(lp))
    g_ours = np.asarray(jax.grad(f_pallas)(lp))
    np.testing.assert_allclose(g_ours, g_ref, rtol=1e-3, atol=1e-4)


def test_pallas_weighted_grads():
    # non-uniform upstream cotangents flow through correctly
    lp, targets, il, tl, v = make_case(b=4, seed=2)
    w = jnp.asarray(np.array([1.0, 0.5, 0.0, 2.0], np.float32))

    def f_scan(x):
        return jnp.sum(ctc_forward_neg_log_likelihood(x, targets, il, tl, v) * w)

    def f_pallas(x):
        return jnp.sum(ctc_loss_pallas(x, targets, il, tl, v, True) * w)

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_pallas)(lp)), np.asarray(jax.grad(f_scan)(lp)),
        rtol=1e-3, atol=1e-4,
    )
