#!/usr/bin/env python
"""Persistent TPU job worker.

This deployment grants the (single) TPU chip to one process at a time, and a
new client blocks until the previous grant expires (~minutes). Iterating on
TPU measurements from fresh processes is therefore painfully slow. This
worker claims the chip ONCE and then executes job scripts submitted as files:

    python scripts/tpu_worker.py /tmp/tpu_jobs &
    # submit:    cp myjob.py /tmp/tpu_jobs/001_myjob.py
    # result:    /tmp/tpu_jobs/001_myjob.out  (+ .done marker)

Each job runs with exec() in a fresh namespace sharing the process (and thus
the device, the compilation cache, and any warm jits registered in
``SHARED``). A job named ``quit.py`` shuts the worker down.
"""

import io
import os
import sys
import time
import traceback
import contextlib

SHARED = {}  # cross-job scratch (warm params, compiled fns, ...)


def main(jobdir: str) -> None:
    os.makedirs(jobdir, exist_ok=True)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax  # claim the chip now
    import jax.numpy as jnp
    from subcort_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    print("worker: devices", jax.devices(), flush=True)
    float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum())
    with open(os.path.join(jobdir, "READY"), "w") as fh:
        fh.write(str(os.getpid()))
    print("worker: ready", flush=True)

    done = set()
    while True:
        jobs = sorted(f for f in os.listdir(jobdir)
                      if f.endswith(".py") and f not in done)
        for job in jobs:
            done.add(job)
            path = os.path.join(jobdir, job)
            if job == "quit.py":
                print("worker: quit", flush=True)
                return
            out_path = path[:-3] + ".out"
            buf = io.StringIO()
            t0 = time.time()
            try:
                # pick up source edits between jobs: purge framework modules
                for name in [n for n in list(sys.modules)
                             if n.startswith("subcort_tpu")]:
                    del sys.modules[name]
                with open(path) as fh:
                    src = fh.read()
                ns = {"SHARED": SHARED, "__name__": "__tpu_job__"}
                with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
                    exec(compile(src, path, "exec"), ns)
                status = "ok"
            except Exception:
                buf.write(traceback.format_exc())
                status = "error"
            with open(out_path, "w") as fh:
                fh.write(buf.getvalue())
                fh.write(f"\n[{status} in {time.time() - t0:.1f}s]\n")
            open(path[:-3] + ".done", "w").close()
        time.sleep(0.5)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_jobs")
