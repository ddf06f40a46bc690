"""NeMo/torch state_dict -> our flax params pytree (pure numpy).

Parity target: the reference checkpoint surface —
`Model.restore_from('x.nemo')` (`/root/reference/nemo/core/classes/modelPT.py:258`,
`save_restore_connector.py:34-67`) serializes the torch `state_dict()` of
`EncDecCTCModel`/`EncDecRNNTModel`. This module maps those tensors onto our
flax module tree (models/conformer.py, models/ctc_model.py, models/rnnt.py)
so any released NeMo Conformer checkpoint can run here.

Layout rules (torch -> flax):
  Linear    weight [out, in]            -> Dense kernel [in, out]      (T)
  Conv2d    weight [out, in, kh, kw]    -> Conv kernel [kh, kw, in, out]
  Conv1d k1 weight [out, in, 1]         -> Dense kernel [in, out]
  depthwise Conv1d [d, 1, k]            -> [k, 1, d]
  LSTM      weight_ih_l{k} [4H, in]     -> lstm{k}_wx [in, 4H]  (gate order
            i,f,g,o identical); bias_ih + bias_hh -> lstm{k}_b, minus the
            runtime forget-gate constant our cell re-adds (models/rnnt.py
            _cell: fbias) so loaded checkpoints are bit-equivalent.
  BatchNorm weight/bias -> scale/bias (params); running_mean/var ->
            mean/var (batch_stats collection).
  ConvSubsampling out-Linear: torch flattens [B, C, T, F']->(c-major), ours
            [B, T, F', C]->(f-major); rows are permuted accordingly.

Everything here takes/returns plain numpy; no torch import required (the
archive reader in nemo_archive.py does the torch.load).
"""

from __future__ import annotations

import math

import numpy as np


def _t(w):  # torch Linear weight -> flax Dense kernel
    return np.ascontiguousarray(np.asarray(w, np.float32).T)


def _ln(sd, key):  # torch LayerNorm/BatchNorm affine -> flax scale/bias
    return {"scale": np.asarray(sd[key + ".weight"], np.float32),
            "bias": np.asarray(sd[key + ".bias"], np.float32)}


def _dense(sd, key):
    out = {"kernel": _t(sd[key + ".weight"])}
    if key + ".bias" in sd:
        out["bias"] = np.asarray(sd[key + ".bias"], np.float32)
    return out


def _conv1x1(sd, key):  # Conv1d kernel_size=1 -> Dense
    w = np.asarray(sd[key + ".weight"], np.float32)[:, :, 0]  # [out, in]
    return {"kernel": np.ascontiguousarray(w.T),
            "bias": np.asarray(sd[key + ".bias"], np.float32)}


def _conv2d(sd, key):  # torch Conv2d [out,in,kh,kw] -> flax [kh,kw,in,out]
    w = np.asarray(sd[key + ".weight"], np.float32)
    return {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "bias": np.asarray(sd[key + ".bias"], np.float32)}


def _bn(sd, key):
    """torch BatchNorm2d -> (flax params {scale,bias}, stats {mean,var})."""
    return (
        {"scale": np.asarray(sd[key + ".weight"], np.float32),
         "bias": np.asarray(sd[key + ".bias"], np.float32)},
        {"mean": np.asarray(sd[key + ".running_mean"], np.float32),
         "var": np.asarray(sd[key + ".running_var"], np.float32)},
    )


def _freq_out(feat_in: int, reps: int, mode: str) -> int:
    """Frequency-axis output size: same geometry as the time axis, taken
    from the model's own table so the two can never desync."""
    from conformer_nemo_tpu.models.conformer import calc_sub_length

    return int(calc_sub_length(feat_in, mode, reps))


def convert_conformer_encoder(sd: dict, cfg, prefix: str = "encoder."):
    """-> (params, batch_stats) for our ConformerEncoder module.

    `cfg`: ConformerEncoderConfig (shapes/modes must match the checkpoint).
    `sd`: flat {torch_name: array}; names as in the reference encoder
    (conformer_encoder.py:152-216, conformer_modules.py:88-158,
    multi_head_attention.py:175-232, subsampling.py:44-176).
    """
    p = {}
    stats = {}
    g = lambda k: sd[prefix + k]

    # ---- pre_encode -----------------------------------------------------
    # torch Sequential module indices per repetition (subsampling.py:72-150):
    #   striding:   [Conv, act]                    -> conv at 2j
    #   vggnet:     [Conv, act, Conv, act, Pool]   -> convs at 5j, 5j+2
    #   resnet:     [ResNetBlock, Pool]            -> block at 2j
    #   subencoder: [SEEncoderLayer]               -> layer at j
    from conformer_nemo_tpu.models.conformer import _SUBSAMPLING_GEOM

    if cfg.subsampling in _SUBSAMPLING_GEOM and cfg.subsampling_factor > 1:
        mode = cfg.subsampling
        reps = int(math.log2(cfg.subsampling_factor))
        pe = {}
        pe_stats = {}
        for j in range(reps):
            if mode == "striding":
                pe[f"conv{j}"] = _conv2d(sd, prefix + f"pre_encode.conv.{2 * j}")
            elif mode == "vggnet":
                pe[f"conv{j}a"] = _conv2d(sd, prefix + f"pre_encode.conv.{5 * j}")
                pe[f"conv{j}b"] = _conv2d(sd, prefix + f"pre_encode.conv.{5 * j + 2}")
            elif mode == "resnet":
                blk = prefix + f"pre_encode.conv.{2 * j}"
                pe[f"res{j}a"] = _conv2d(sd, blk + ".conv1")
                pe[f"res{j}b"] = _conv2d(sd, blk + ".conv2")
                pe[f"res{j}a_bn"], pe_stats[f"res{j}a_bn"] = _bn(sd, blk + ".batchnorm1")
                pe[f"res{j}b_bn"], pe_stats[f"res{j}b_bn"] = _bn(sd, blk + ".batchnorm2")
            elif mode == "subencoder":
                blk = prefix + f"pre_encode.conv.{j}"
                for tag, tc in (("a", "1"), ("b", "2"), ("c", "3")):
                    pe[f"se{j}{tag}"] = _conv2d(sd, blk + f".conv{tc}")
                    (pe[f"se{j}{tag}_bn"],
                     pe_stats[f"se{j}{tag}_bn"]) = _bn(sd, blk + f".batchnorm{tc}")
        channels = (cfg.subsampling_conv_channels
                    if cfg.subsampling_conv_channels > 0 else cfg.d_model)
        f_out = _freq_out(cfg.feat_in, reps, mode)
        w = _t(g("pre_encode.out.weight"))  # [C*F', d_model], rows c*F'+f
        r = np.arange(channels * f_out)
        perm = (r % channels) * f_out + (r // channels)  # our row f*C+c <- torch c*F'+f
        pe["out"] = {"kernel": np.ascontiguousarray(w[perm]),
                     "bias": np.asarray(g("pre_encode.out.bias"), np.float32)}
        p["pre_encode"] = pe
        if pe_stats:
            stats["pre_encode"] = pe_stats
    elif cfg.subsampling == "stacking" and cfg.subsampling_factor > 1:
        p["pre_encode"] = {"proj_out": _dense(sd, prefix + "pre_encode.proj_out")}
    elif cfg.subsampling_factor <= 1 or cfg.subsampling in (None, "", "none"):
        p["pre_encode"] = _dense(sd, prefix + "pre_encode")
    else:
        raise NotImplementedError(
            f"checkpoint conversion for subsampling={cfg.subsampling!r}")

    # ---- shared rel-pos biases (untie_biases=False) ---------------------
    if not cfg.untie_biases and cfg.self_attention_model == "rel_pos":
        p["pos_bias_u"] = np.asarray(g("layers.0.self_attn.pos_bias_u"), np.float32)
        p["pos_bias_v"] = np.asarray(g("layers.0.self_attn.pos_bias_v"), np.float32)

    # ---- layers ---------------------------------------------------------
    for i in range(cfg.n_layers):
        lp = f"layers.{i}."
        layer = {}
        for norm in ("norm_feed_forward1", "norm_self_att", "norm_conv",
                     "norm_feed_forward2", "norm_out"):
            layer[norm] = _ln(sd, prefix + lp + norm)
        for ff in ("feed_forward1", "feed_forward2"):
            layer[ff] = {
                "linear1": _dense(sd, prefix + lp + ff + ".linear1"),
                "linear2": _dense(sd, prefix + lp + ff + ".linear2"),
            }
        attn = {
            "linear_q": _dense(sd, prefix + lp + "self_attn.linear_q"),
            "linear_k": _dense(sd, prefix + lp + "self_attn.linear_k"),
            "linear_v": _dense(sd, prefix + lp + "self_attn.linear_v"),
            "linear_out": _dense(sd, prefix + lp + "self_attn.linear_out"),
        }
        if cfg.self_attention_model == "rel_pos":
            attn["linear_pos_kernel"] = _t(g(lp + "self_attn.linear_pos.weight"))
            if cfg.untie_biases:
                attn["pos_bias_u"] = np.asarray(g(lp + "self_attn.pos_bias_u"), np.float32)
                attn["pos_bias_v"] = np.asarray(g(lp + "self_attn.pos_bias_v"), np.float32)
        layer["self_attn"] = attn

        dw = np.asarray(g(lp + "conv.depthwise_conv.weight"), np.float32)  # [d,1,k]
        conv = {
            "pointwise_conv1": _conv1x1(sd, prefix + lp + "conv.pointwise_conv1"),
            "pointwise_conv2": _conv1x1(sd, prefix + lp + "conv.pointwise_conv2"),
            "depthwise_kernel": np.ascontiguousarray(dw.transpose(2, 1, 0)),
            "depthwise_bias": np.asarray(g(lp + "conv.depthwise_conv.bias"), np.float32),
            # reference names the module 'batch_norm' for both norm types
            # (conformer_modules.py:148-153)
            "norm": _ln(sd, prefix + lp + "conv.batch_norm"),
        }
        layer["conv"] = conv
        if cfg.conv_norm_type == "batch_norm":
            stats[f"layers_{i}"] = {"conv": {"norm": {
                "mean": np.asarray(g(lp + "conv.batch_norm.running_mean"), np.float32),
                "var": np.asarray(g(lp + "conv.batch_norm.running_var"), np.float32),
            }}}
        p[f"layers_{i}"] = layer

    if cfg.feat_out > 0 and cfg.feat_out != cfg.d_model:
        p["out_proj"] = _dense(sd, prefix + "out_proj")
    return p, stats


def convert_ctc_model_state(sd: dict, cfg) -> dict:
    """EncDecCTCModel state_dict -> {'params': ..., 'batch_stats': ...} for
    our CTCModel (models/ctc_model.py). `cfg`: CTCModelConfig."""
    enc_p, enc_s = convert_conformer_encoder(sd, cfg.encoder, "encoder.")
    params = {
        "encoder": enc_p,
        # ConvASRDecoder: one 1x1 Conv1d (conv_asr.py:437-439) == our Dense
        "decoder": {"decoder_layers": _conv1x1(sd, "decoder.decoder_layers.0")},
    }
    out = {"params": params}
    if enc_s:
        out["batch_stats"] = {"encoder": enc_s}
    return out


def convert_prediction_network(sd: dict, dec_cfg, prefix: str = "decoder.prediction."):
    """RNNTDecoder prediction net (modules/rnnt.py:159-330 +
    common/parts/rnn.py LSTMDropout) -> our PredictionNetwork params."""
    p = {"embed": {"embedding": np.asarray(sd[prefix + "embed.weight"], np.float32)}}
    h = dec_cfg.pred_hidden
    for k in range(dec_cfg.pred_rnn_layers):
        wih = _t(sd[prefix + f"dec_rnn.lstm.weight_ih_l{k}"])  # [in, 4H]
        whh = _t(sd[prefix + f"dec_rnn.lstm.weight_hh_l{k}"])
        b = (np.asarray(sd[prefix + f"dec_rnn.lstm.bias_ih_l{k}"], np.float32)
             + np.asarray(sd[prefix + f"dec_rnn.lstm.bias_hh_l{k}"], np.float32))
        if dec_cfg.t_max is None and dec_cfg.forget_gate_bias:
            # our cell adds forget_gate_bias at runtime (models/rnnt.py _cell)
            b = b.copy()
            b[h: 2 * h] -= float(dec_cfg.forget_gate_bias)
        p[f"lstm{k}_wx"] = wih
        p[f"lstm{k}_wh"] = whh
        p[f"lstm{k}_b"] = b
    return p


def convert_rnnt_joint(sd: dict, prefix: str = "joint."):
    """RNNTJoint (modules/rnnt.py:1010-1041): enc/pred Linears + joint_net
    Sequential [activation, (dropout), Linear]."""
    last = None
    for key in sd:
        if key.startswith(prefix + "joint_net.") and key.endswith(".weight"):
            idx = int(key[len(prefix + "joint_net."):].split(".")[0])
            last = idx if last is None else max(last, idx)
    if last is None:
        raise KeyError(f"no {prefix}joint_net.*.weight in state dict")
    return {
        "enc": _dense(sd, prefix + "enc"),
        "pred": _dense(sd, prefix + "pred"),
        "out_kernel": _t(sd[prefix + f"joint_net.{last}.weight"]),
        "out_bias": np.asarray(sd[prefix + f"joint_net.{last}.bias"], np.float32),
    }


def convert_rnnt_model_state(sd: dict, cfg) -> dict:
    """EncDecRNNTModel state_dict -> variables for our RNNTModel.
    `cfg`: RNNTModelConfig."""
    enc_p, enc_s = convert_conformer_encoder(sd, cfg.encoder, "encoder.")
    params = {
        "encoder": enc_p,
        "decoder": convert_prediction_network(sd, cfg.decoder),
        "joint": convert_rnnt_joint(sd),
    }
    out = {"params": params}
    if enc_s:
        out["batch_stats"] = {"encoder": enc_s}
    return out
