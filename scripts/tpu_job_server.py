"""Long-lived TPU experiment job server.

The axon tunnel charges every fresh process ~10 minutes of remote AOT
before its first step executes (even with a warm persistent compile
cache); batching all experiments into ONE process pays that once. This
server polls ``/tmp/tpu_jobs/*.py`` (sorted by name), executes each job
in its own namespace inside this process with stdout/stderr teed to
``/tmp/tpu_jobs/out/<name>.out``, then moves the job file to
``/tmp/tpu_jobs/done/``. Touch ``/tmp/tpu_jobs/STOP`` to shut down.

Jobs are plain python scripts. They may mutate ``os.environ`` to flip
trace-time experiment knobs (e.g. LAVILA_FLASH_BLOCK_Q) — build + jit a
fresh step AFTER setting knobs so the trace sees them. Helpers live in
``scripts/tpu_exp_lib.py``.
"""

import gc
import glob
import os
import shutil
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

JOBS = "/tmp/tpu_jobs"


class _Tee:
    def __init__(self, *streams):
        self.streams = streams

    def write(self, data):
        for s in self.streams:
            s.write(data)
            s.flush()

    def flush(self):
        for s in self.streams:
            s.flush()

    def close(self):  # some libs close stdout handles they're given
        self.flush()


def main():
    os.makedirs(os.path.join(JOBS, "out"), exist_ok=True)
    os.makedirs(os.path.join(JOBS, "done"), exist_ok=True)
    print(f"[server] devices: {jax.devices()}", flush=True)
    print(f"[server] polling {JOBS}/*.py", flush=True)
    while not os.path.exists(os.path.join(JOBS, "STOP")):
        for path in sorted(glob.glob(os.path.join(JOBS, "*.py"))):
            name = os.path.basename(path)
            out_path = os.path.join(JOBS, "out", name + ".out")
            print(f"[server] running {name}", flush=True)
            t0 = time.time()
            # Purge repo modules so source edits between jobs take
            # effect — jax and its caches stay loaded, which is the
            # whole point of the shared process.
            for mod in [m for m in sys.modules
                        if m.split(".")[0] in ("lavila_tpu", "tpu_exp_lib",
                                               "bench", "cli", "scripts")]:
                del sys.modules[mod]
            src = open(path).read()
            with open(out_path, "w") as out:
                tee = _Tee(sys.__stdout__, out)
                old_out, old_err = sys.stdout, sys.stderr
                sys.stdout = sys.stderr = tee
                try:
                    ns = {"__name__": "__tpu_job__", "__file__": path}
                    exec(compile(src, path, "exec"), ns)
                    status = "DONE"
                except Exception:
                    traceback.print_exc()
                    status = "FAILED"
                finally:
                    sys.stdout, sys.stderr = old_out, old_err
                    # Free the job's device buffers NOW: a failed job's
                    # namespace (and exception frames) otherwise pins its
                    # arrays in HBM and every later job inherits a
                    # near-full chip (job 05 round 5: four instant
                    # RESOURCE_EXHAUSTED failures after one OOM'd job).
                    ns.clear()
                    del ns
                    gc.collect()
                with open(out_path, "a") as f2:
                    f2.write(f"\n[server] {status} in "
                             f"{time.time() - t0:.1f}s\n")
            print(f"[server] {name}: {status} ({time.time() - t0:.1f}s)",
                  flush=True)
            shutil.move(path, os.path.join(JOBS, "done", name))
        time.sleep(2)
    print("[server] STOP seen, exiting", flush=True)


if __name__ == "__main__":
    main()
