from conformer_nemo_tpu.convert.nemo_weights import (  # noqa: F401
    convert_conformer_encoder,
    convert_ctc_model_state,
    convert_rnnt_model_state,
)
