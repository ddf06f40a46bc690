from conformer_nemo_tpu.ops.ctc_loss import ctc_loss
