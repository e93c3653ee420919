"""Persistent TPU job worker: holds the device claim + in-process compile
cache across experiments.

Polls /tmp/tpu_jobs/ for NNN_name.py files (sorted), executes each in one
shared namespace (so arrays/functions persist between jobs), writes stdout+
traceback to <job>.out and renames the job to <job>.done. Submit jobs by
writing the file; read the .out when it appears.
"""
import io
import glob
import os
import sys
import time
import traceback

JOBS = "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)

import jax  # noqa: E402  (claims the TPU once)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

ns = {"jax": jax, "jnp": jnp, "np": np, "time": time}
print("worker ready, devices:", jax.devices(), flush=True)
open(os.path.join(JOBS, "READY"), "w").write("ok")

while True:
    jobs = sorted(glob.glob(os.path.join(JOBS, "*.py")))
    if not jobs:
        time.sleep(0.25)
        continue
    job = jobs[0]
    buf = io.StringIO()
    t0 = time.time()
    old = sys.stdout
    sys.stdout = buf
    try:
        code = open(job).read()
        exec(compile(code, job, "exec"), ns)
        status = "ok"
    except BaseException:
        traceback.print_exc(file=buf)
        status = "error"
    finally:
        sys.stdout = old
    out = f"# status={status} wall={time.time() - t0:.1f}s\n" + buf.getvalue()
    with open(job + ".out", "w") as f:
        f.write(out)
    os.rename(job, job + ".done")
    print(f"{job}: {status} ({time.time() - t0:.1f}s)", flush=True)
