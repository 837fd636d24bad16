from visfd_tpu.utils.progress import Report, stage  # noqa: F401
from visfd_tpu.utils.profiling import device_trace, stage_timings  # noqa: F401
