"""Persistent TPU job worker.

The axon tunnel stalls for minutes on the *first* device->host transfer of
every fresh process, so benchmarking from short-lived processes is hopeless.
This worker pays that cost once, then executes job scripts dropped into
/tmp/tpu_jobs/ (NAME.py -> NAME.out with stdout+stderr+traceback, NAME.done
marker).  Drive it by writing a job file and polling for the .done marker.
"""

import io
import os
import sys
import time
import traceback

JOBS = "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)

import numpy as np  # noqa: E402

print("[worker] importing jax...", flush=True)
import jax  # noqa: E402

print(f"[worker] devices: {jax.devices()}", flush=True)
arr = jax.device_put(np.arange(16, dtype=np.float32))
arr.block_until_ready()
t0 = time.perf_counter()
np.asarray(arr)
print(f"[worker] first D2H warm-up: {time.perf_counter() - t0:.1f}s", flush=True)
print("[worker] ready", flush=True)

GLOBALS = {"__name__": "__tpu_job__"}

# The tunnel admits ONE client: a worker that outlives its usefulness blocks
# every other process (including the driver's bench run) from claiming the
# chip. Exit after this much time with no queued jobs.
IDLE_LIMIT_S = float(os.environ.get("TPU_WORKER_IDLE_S", 900))
last_activity = time.monotonic()

while True:
    jobs = sorted(
        f for f in os.listdir(JOBS)
        if f.endswith(".py") and not os.path.exists(os.path.join(JOBS, f[:-3] + ".done"))
    )
    if not jobs:
        if time.monotonic() - last_activity > IDLE_LIMIT_S:
            print(f"[worker] idle {IDLE_LIMIT_S:.0f}s; releasing the device", flush=True)
            break
        time.sleep(0.5)
        continue
    last_activity = time.monotonic()
    name = jobs[0][:-3]
    path = os.path.join(JOBS, jobs[0])
    out_path = os.path.join(JOBS, name + ".out")
    print(f"[worker] running {name}", flush=True)
    buf = io.StringIO()
    old_out, old_err = sys.stdout, sys.stderr
    sys.stdout = sys.stderr = buf
    try:
        with open(path) as f:
            code = f.read()
        exec(compile(code, path, "exec"), GLOBALS)
    except SystemExit:
        # a job may request shutdown (releases the single-client tunnel)
        sys.stdout, sys.stderr = old_out, old_err
        print("[worker] job requested shutdown; releasing the device",
              flush=True)
        raise
    except BaseException:
        traceback.print_exc()
    finally:
        sys.stdout, sys.stderr = old_out, old_err
    with open(out_path, "w") as f:
        f.write(buf.getvalue())
    with open(os.path.join(JOBS, name + ".done"), "w") as f:
        f.write("done")
    print(f"[worker] finished {name}", flush=True)
