from subcort_tpu.utils.runtime import (  # noqa: F401
    enable_compilation_cache,
    enable_nan_checks,
    profile_trace,
    timer,
)
