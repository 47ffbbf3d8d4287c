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
def timer(label: str, sink=None):
    """Wall-clock timer context; appends (label, seconds) to sink if given."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink.append((label, dt))
    else:
        print(f"[timer] {label}: {dt:.3f}s")
