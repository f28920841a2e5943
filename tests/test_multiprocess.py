"""Real multi-process (2-host) pod coverage on CPU.

Exercises what single-process tests cannot: ``jax.distributed``
bootstrap through ``cli.launch_tpu_pod``, Gloo cross-process
collectives, per-process loader sharding assembled into global arrays
(``shard_batch`` → ``make_array_from_process_local_data``), the
collective orbax checkpoint save (all processes enter, process 0 owns
the filesystem bookkeeping), and the auto-resume/requeue contract
(reference run_with_submitit_pretrain.py semantics: re-run the same
command, training resumes from the checkpoint in --output-dir).
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WRAPPER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.pop("JAX_PLATFORMS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    # share the suite's persistent compile cache (conftest.py) — each of
    # the 4 child processes otherwise pays a full cold XLA:CPU compile
    jax.config.update("jax_compilation_cache_dir", {cache!r})
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    sys.path.insert(0, {repo!r})
    from cli.launch_tpu_pod import main
    state = main(["--coordinator", "localhost:{port}",
                  "--num-processes", "2", "--process-id", sys.argv[1],
                  "pretrain",
                  "--dataset", "synthetic",
                  "--model", "CLIP_OPENAI_TIMESFORMER_MINI",
                  "--steps", "2", "--batch-size", "8", "--epochs", "1",
                  "--clip-length", "4", "--output-dir", {out!r},
                  "--print-freq", "1", "--workers", "2", "--disable-amp"])
    if state is not None:
        total = sum(float(abs(p).sum()) for p in jax.tree.leaves(
            state.params))
        # builtin print is master-only after setup_for_distributed
        sys.stdout.write(f"PARAM_DIGEST {{total:.6f}}\\n")
        sys.stdout.flush()
""")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch_pair(script, _attempts=2):
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    procs = [subprocess.Popen([sys.executable, "-c", script, str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env,
                              cwd=REPO)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    if any(p.returncode != 0 for p in procs):
        # Gloo's rendezvous has a fixed 30 s GetKeyValue deadline; on this
        # one-CPU host a concurrently loaded machine can skew the two
        # processes past it (one compiles while the other sits in the first
        # collective).  That is a host-load artifact, not a product bug —
        # retry once before failing.
        if _attempts > 1 and any("DEADLINE_EXCEEDED" in o for o in outs):
            return _launch_pair(script, _attempts - 1)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"
    return outs


def test_two_process_pretrain_and_requeue(tmp_path):
    import jax  # parent's conftest already picked the host-keyed dir
    cache = jax.config.jax_compilation_cache_dir
    port = _free_port()
    out_dir = str(tmp_path / "run")
    script = WRAPPER.format(repo=REPO, port=port, out=out_dir, cache=cache)

    outs = _launch_pair(script)
    # both processes saw the global mesh
    for out in outs:
        assert "2, 4 local / 8 global devices" in out, out[-2000:]
    # replicated params identical across processes after the global step
    digests = [line.split()[1] for out in outs for line in out.splitlines()
               if line.startswith("PARAM_DIGEST")]
    assert len(digests) == 2 and digests[0] == digests[1], digests

    # checkpoint written once, with embedded config
    assert os.path.exists(os.path.join(out_dir, "checkpoint_latest"))
    meta = json.loads(open(os.path.join(
        out_dir, "checkpoint_latest.json")).read())
    assert meta["config"]["model"] == "CLIP_OPENAI_TIMESFORMER_MINI"
    assert meta["epoch"] == 0

    # requeue contract: re-run the SAME command on both "hosts"; every
    # process must take the restore path (collective orbax restore) and
    # skip already-done epochs.
    port2 = _free_port()
    outs2 = _launch_pair(WRAPPER.format(repo=REPO, port=port2, out=out_dir,
                                        cache=cache))
    # print() is master-only after setup_for_distributed — check rank 0
    assert "resuming from" in outs2[0], outs2[0][-2000:]
    # every rank restored the same params (collective orbax restore)
    digests2 = [line.split()[1] for out in outs2
                for line in out.splitlines()
                if line.startswith("PARAM_DIGEST")]
    assert len(digests2) == 2 and digests2[0] == digests2[1], digests2
