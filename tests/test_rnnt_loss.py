"""RNN-T loss: forward vs a brute-force NumPy lattice DP, gradient vs autodiff
of a loop-based jnp implementation (the same oracle role `rnnt_numpy.py`
plays in the reference test suite — written from the recurrence, not ported).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conformer_nemo_tpu.ops.rnnt_loss import rnnt_loss_from_logits


def numpy_rnnt_nll(logits, targets, t_len, u_len, blank):
    """-log p for ONE sample via the textbook alpha recursion (Graves 2012).

    logits: [T, U+1, V]; targets: [U].
    """
    logp = logits - np.log(np.sum(np.exp(logits), axis=-1, keepdims=True))
    T, U1, _ = logp.shape
    alpha = np.full((t_len, u_len + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(t_len):
        for u in range(u_len + 1):
            if t == 0 and u == 0:
                continue
            terms = []
            if t > 0:
                terms.append(alpha[t - 1, u] + logp[t - 1, u, blank])
            if u > 0:
                terms.append(alpha[t, u - 1] + logp[t, u - 1, targets[u - 1]])
            alpha[t, u] = np.logaddexp.reduce(terms)
    return -(alpha[t_len - 1, u_len] + logp[t_len - 1, u_len, blank])


def jnp_rnnt_nll_loops(logits, targets, t_len, u_len, blank):
    """Differentiable loop-based reference (small sizes only)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    alpha = {(0, 0): 0.0}
    for t in range(t_len):
        for u in range(u_len + 1):
            if t == 0 and u == 0:
                continue
            terms = []
            if t > 0:
                terms.append(alpha[(t - 1, u)] + logp[t - 1, u, blank])
            if u > 0:
                terms.append(alpha[(t, u - 1)] + logp[t, u - 1, targets[u - 1]])
            alpha[(t, u)] = jax.scipy.special.logsumexp(jnp.stack(terms))
    return -(alpha[(t_len - 1, u_len)] + logp[t_len - 1, u_len, blank])


def make_case(b=3, t=6, u=3, v=5, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, t, u + 1, v).astype(np.float32)
    targets = rng.randint(0, v - 1, size=(b, u)).astype(np.int32)
    t_lens = np.array([t, t - 1, t - 2], dtype=np.int32)[:b]
    u_lens = np.array([u, u - 1, u - 2], dtype=np.int32)[:b]
    blank = v - 1
    return logits, targets, t_lens, u_lens, blank


def test_forward_matches_numpy():
    logits, targets, t_lens, u_lens, blank = make_case()
    ours = np.asarray(
        rnnt_loss_from_logits(jnp.asarray(logits), targets, t_lens, u_lens, blank)
    )
    for i in range(logits.shape[0]):
        ref = numpy_rnnt_nll(
            logits[i].astype(np.float64), targets[i], int(t_lens[i]), int(u_lens[i]), blank
        )
        np.testing.assert_allclose(ours[i], ref, rtol=1e-4, atol=1e-4)


def test_gradient_matches_autodiff_oracle():
    logits, targets, t_lens, u_lens, blank = make_case(b=2, t=5, u=2, v=4, seed=1)

    def ours_loss(x):
        return jnp.sum(rnnt_loss_from_logits(x, targets, t_lens, u_lens, blank))

    g_ours = np.asarray(jax.grad(ours_loss)(jnp.asarray(logits)))

    for i in range(2):
        def oracle(x):
            return jnp_rnnt_nll_loops(x, targets[i], int(t_lens[i]), int(u_lens[i]), blank)

        g_ref = np.asarray(jax.grad(oracle)(jnp.asarray(logits[i])))
        # Oracle only defines grads inside the valid lattice
        tl, ul = int(t_lens[i]), int(u_lens[i])
        np.testing.assert_allclose(
            g_ours[i, :tl, : ul + 1], g_ref[:tl, : ul + 1], rtol=1e-3, atol=1e-4
        )
        # outside-lattice grads must be zero
        assert np.abs(g_ours[i, tl:]).max(initial=0.0) == 0.0
        assert np.abs(g_ours[i, :, ul + 1 :]).max(initial=0.0) == 0.0


def test_fastemit_scales_loss():
    logits, targets, t_lens, u_lens, blank = make_case(seed=2)
    base = np.asarray(rnnt_loss_from_logits(jnp.asarray(logits), targets, t_lens, u_lens, blank))
    fe = np.asarray(
        rnnt_loss_from_logits(jnp.asarray(logits), targets, t_lens, u_lens, blank, 0.01)
    )
    np.testing.assert_allclose(fe, base * 1.01, rtol=1e-5)


def test_clamp_bounds_gradient():
    logits, targets, t_lens, u_lens, blank = make_case(seed=3)

    def loss(x):
        return jnp.sum(rnnt_loss_from_logits(x, targets, t_lens, u_lens, blank, 0.0, 0.01))

    g = np.asarray(jax.grad(loss)(jnp.asarray(logits)))
    assert np.abs(g).max() <= 0.01 + 1e-6


def test_single_frame_single_label():
    # T=1, U=1: must emit label then blank at t=0.
    v, blank = 3, 2
    logits = np.random.RandomState(4).randn(1, 1, 2, v).astype(np.float32)
    targets = np.array([[0]], dtype=np.int32)
    nll = np.asarray(
        rnnt_loss_from_logits(
            jnp.asarray(logits), targets, np.array([1], np.int32), np.array([1], np.int32), blank
        )
    )
    logp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    expected = -(logp[0, 0, 0, 0] + logp[0, 0, 1, blank])
    np.testing.assert_allclose(nll[0], float(expected), rtol=1e-5)
