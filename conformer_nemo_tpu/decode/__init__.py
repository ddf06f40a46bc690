from conformer_nemo_tpu.decode.ctc_greedy import ctc_greedy_decode, collapse_ctc_ids
from conformer_nemo_tpu.decode.wer import word_error_rate, edit_distance
from conformer_nemo_tpu.decode import vad
