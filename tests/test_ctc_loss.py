"""CTC loss parity vs torch.nn.CTCLoss (the reference's native kernel,
losses/ctc.py:25), including gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from conformer_nemo_tpu.ops.ctc_loss import ctc_forward_neg_log_likelihood, ctc_loss


def make_case(b=3, t=20, v=6, u=5, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, t, v + 1).astype(np.float32)
    log_probs = torch.log_softmax(torch.from_numpy(logits), dim=-1)
    targets = rng.randint(0, v, size=(b, u)).astype(np.int32)
    input_lengths = np.array([t, t - 5, t - 9], dtype=np.int32)[:b]
    target_lengths = np.array([u, u - 2, u - 4], dtype=np.int32)[:b]
    return log_probs, targets, input_lengths, target_lengths, v


def torch_ctc(log_probs, targets, input_lengths, target_lengths, blank):
    f = torch.nn.CTCLoss(blank=blank, reduction="none")
    return f(
        log_probs.transpose(0, 1),
        torch.from_numpy(targets).long(),
        torch.from_numpy(input_lengths).long(),
        torch.from_numpy(target_lengths).long(),
    )


def test_ctc_loss_matches_torch():
    log_probs, targets, il, tl, v = make_case()
    ref = torch_ctc(log_probs, targets, il, tl, blank=v).numpy()
    ours = np.asarray(
        ctc_forward_neg_log_likelihood(jnp.asarray(log_probs.numpy()), targets, il, tl, v)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_ctc_loss_gradient_matches_torch():
    # Compare d loss / d LOGITS (through log_softmax) — the training-path
    # gradient. (torch's native CTC backward returns the log_softmax-chained
    # gradient even w.r.t. raw log-prob inputs, so raw-input grads are not
    # comparable; end-to-end logits grads are.)
    b, t, v, u = 2, 12, 4, 3
    rng = np.random.RandomState(1)
    logits = rng.randn(b, t, v + 1).astype(np.float32)
    targets = rng.randint(0, v, size=(b, u)).astype(np.int32)
    il = np.array([t, t - 5], dtype=np.int32)
    tl = np.array([u, u - 2], dtype=np.int32)

    tlogits = torch.from_numpy(logits).clone().requires_grad_(True)
    loss = torch_ctc(torch.log_softmax(tlogits, -1), targets, il, tl, blank=v).mean()
    loss.backward()
    ref_grad = tlogits.grad.numpy()

    def f(x):
        lp = jax.nn.log_softmax(x, axis=-1)
        return jnp.mean(ctc_forward_neg_log_likelihood(lp, targets, il, tl, v))

    ours_grad = np.asarray(jax.grad(f)(jnp.asarray(logits)))
    np.testing.assert_allclose(ours_grad, ref_grad, rtol=1e-3, atol=1e-4)


def test_mean_batch_reduction():
    log_probs, targets, il, tl, v = make_case()
    per = np.asarray(
        ctc_forward_neg_log_likelihood(jnp.asarray(log_probs.numpy()), targets, il, tl, v)
    )
    mb = np.asarray(
        ctc_loss(jnp.asarray(log_probs.numpy()), targets, il, tl, blank_id=v)
    )
    np.testing.assert_allclose(mb, per.mean(), rtol=1e-6)


def test_empty_target():
    # All-blank path: loss = -sum_t log p(blank)
    b, t, v = 1, 5, 3
    logits = np.random.RandomState(2).randn(b, t, v + 1).astype(np.float32)
    lp = torch.log_softmax(torch.from_numpy(logits), -1).numpy()
    targets = np.zeros((b, 2), dtype=np.int32)
    ours = np.asarray(
        ctc_forward_neg_log_likelihood(
            jnp.asarray(lp), targets, np.array([t], np.int32), np.array([0], np.int32), v
        )
    )
    expected = -lp[0, :, v].sum()
    np.testing.assert_allclose(ours[0], expected, rtol=1e-5)


def test_repeated_labels():
    # Repeats force blank between them; checks the can_skip logic.
    b, t, v, u = 1, 10, 3, 4
    logits = np.random.RandomState(3).randn(b, t, v + 1).astype(np.float32)
    lp = torch.log_softmax(torch.from_numpy(logits), -1)
    targets = np.array([[1, 1, 2, 2]], dtype=np.int32)
    il, tl = np.array([t], np.int32), np.array([u], np.int32)
    ref = torch_ctc(lp, targets, il, tl, blank=v).numpy()
    ours = np.asarray(
        ctc_forward_neg_log_likelihood(jnp.asarray(lp.numpy()), targets, il, tl, v)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4)
