from visfd_tpu.utils.progress import (Report, stage,  # noqa: F401
                                      record_path, stage_paths,
                                      reset_paths, format_paths)
from visfd_tpu.utils.profiling import device_trace, stage_timings  # noqa: F401
