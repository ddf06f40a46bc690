from conformer_nemo_tpu.data.tokenizers import (
    AggregateTokenizer,
    CharTokenizer,
    TokenizerSpec,
)
from conformer_nemo_tpu.data.manifest import read_manifest
