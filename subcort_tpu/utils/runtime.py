"""Runtime utilities: compilation cache, timers, profiling hooks."""

from __future__ import annotations

import contextlib
import os
import time


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    The TPU remote compiler in some deployments takes minutes for the full
    training step; the persistent cache makes that a once-ever cost (keyed
    by HLO hash, so identical shapes/programs hit across processes and
    sessions). Safe to call multiple times.
    """
    import jax

    path = path or os.environ.get("SUBCORT_COMPILE_CACHE",
                                  os.path.expanduser("~/.cache/subcort_jax"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # cache everything, including programs the backend marks non-cacheable
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax: flag names differ; cache is an optimization only


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """``jax.profiler.trace`` wrapper (SURVEY.md §5 tracing plan): captures a
    device+host trace viewable in TensorBoard/Perfetto. No-op when
    ``log_dir`` is falsy, so call sites can pass the CLI flag through."""
    if not log_dir:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield
    print(f"[profile] trace written to {log_dir}")


def enable_nan_checks() -> None:
    """Debug-mode NaN detection (SURVEY.md §5 sanitizer plan): every jit
    output is checked and the first NaN raises with the offending
    computation. Costly — a debug flag, not a production default."""
    import jax

    jax.config.update("jax_debug_nans", True)


@contextlib.contextmanager
def timer(label: str, sink=None):
    """Wall-clock timer context; appends (label, seconds) to sink if given."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink.append((label, dt))
    else:
        print(f"[timer] {label}: {dt:.3f}s")
