from subcort_tpu.utils.runtime import enable_compilation_cache  # noqa: F401
