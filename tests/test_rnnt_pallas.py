"""Pallas RNN-T lattice kernels == lax.scan implementation (interpret mode
on CPU; the NumPy oracle in test_rnnt_loss.py anchors the scan itself)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conformer_nemo_tpu.ops import rnnt_loss as rl


def _rand_case(seed=0, b=3, t=14, u=6, v=9, ragged=True):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(b, t, u + 1, v).astype(np.float32) * 2.0)
    targets = jnp.asarray(rng.randint(0, v - 1, size=(b, u)).astype(np.int32))
    if ragged:
        t_lens = jnp.asarray(rng.randint(max(2, t - 5), t + 1, size=b), jnp.int32)
        u_lens = jnp.asarray(rng.randint(1, u + 1, size=b), jnp.int32)
    else:
        t_lens = jnp.full((b,), t, jnp.int32)
        u_lens = jnp.full((b,), u, jnp.int32)
    return logits, targets, t_lens, u_lens, v - 1


@pytest.mark.parametrize("seed,ragged", [(0, True), (1, False), (2, True)])
def test_pallas_lattices_match_scan(seed, ragged):
    logits, targets, t_lens, u_lens, blank = _rand_case(seed, ragged=ragged)
    blank_lp, label_lp, _ = rl._prep(logits, targets, blank)
    a_scan = rl._compute_alphas(blank_lp, label_lp, t_lens, u_lens, "scan")
    a_pl = rl._compute_alphas(blank_lp, label_lp, t_lens, u_lens, "pallas")
    np.testing.assert_allclose(np.asarray(a_scan), np.asarray(a_pl),
                               rtol=1e-5, atol=1e-5)
    b_scan = rl._compute_betas(blank_lp, label_lp, t_lens, u_lens, "scan")
    b_pl = rl._compute_betas(blank_lp, label_lp, t_lens, u_lens, "pallas")
    np.testing.assert_allclose(np.asarray(b_scan), np.asarray(b_pl),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("fastemit,clamp", [(0.0, -1.0), (0.1, -1.0), (0.0, 2.0)])
def test_pallas_loss_and_grad_match_scan(fastemit, clamp):
    logits, targets, t_lens, u_lens, blank = _rand_case(3)

    def loss(impl):
        def f(lg):
            return jnp.sum(rl.rnnt_loss_from_logits(
                lg, targets, t_lens, u_lens, blank, fastemit, clamp, impl))
        return f

    v_scan, g_scan = jax.value_and_grad(loss("scan"))(logits)
    v_pl, g_pl = jax.value_and_grad(loss("pallas"))(logits)
    np.testing.assert_allclose(float(v_scan), float(v_pl), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_scan), np.asarray(g_pl),
                               rtol=1e-5, atol=1e-6)


def test_pallas_batch_tiling_pads():
    """A batch that doesn't divide the VMEM tile still computes correctly."""
    logits, targets, t_lens, u_lens, blank = _rand_case(4, b=5, t=10, u=4, v=7)
    nll_scan = rl.rnnt_loss_from_logits(
        logits, targets, t_lens, u_lens, blank, 0.0, -1.0, "scan")
    nll_pl = rl.rnnt_loss_from_logits(
        logits, targets, t_lens, u_lens, blank, 0.0, -1.0, "pallas")
    np.testing.assert_allclose(np.asarray(nll_scan), np.asarray(nll_pl),
                               rtol=1e-6)
