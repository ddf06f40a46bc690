from conformer_nemo_tpu.utils.timers import NamedTimer, StepTimingHook
from conformer_nemo_tpu.utils.profiling import profile_trace
