from conformer_nemo_tpu.audio.features import (
    MelFeatureConfig,
    log_mel_spectrogram,
    mel_filterbank,
    mel_seq_len,
)
from conformer_nemo_tpu.audio.spec_augment import (
    SpecAugmentConfig,
    apply_spectrogram_augmentation,
)
