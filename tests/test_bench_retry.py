"""bench.py driver contract: retry on transient failures, and print
EXACTLY ONE JSON line on stdout whether the bench succeeds or not
(round-3 verdict: a single axon UNAVAILABLE at init must not erase a
round's perf evidence, and the failure path must not print a traceback
to stdout).

Timeout policy under test: init-phase hangs are killed and retried
(pre-init clients have no server-side work), but a post-init kill —
mid remote compile/dispatch — must NOT be retried, because the kill
orphans server-side work that congests the tunnel for every later
attempt (CLAUDE.md: 'NEVER kill a TPU client mid-compile')."""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def test_extract_json_line_picks_last_metric_record():
    text = "\n".join([
        "warmup chatter",
        '{"not_a_metric": 1}',
        '{"metric": "a", "value": 1}',
        "trailing log line",
        '{"metric": "b", "value": 2}',
        "{broken json",
    ])
    assert json.loads(bench._extract_json_line(text))["metric"] == "b"
    assert bench._extract_json_line("no json here") is None


class _Args:
    narrator = False
    data = False
    model = "tsf_b"
    decoder = "base"


def test_retry_then_success(monkeypatch, capsys):
    calls = []

    def fake_attempt(cmd, init_timeout_s, run_timeout_s):
        calls.append(cmd)
        if len(calls) < 2:
            return ("done", 1, "",
                    "Unable to initialize backend 'axon': UNAVAILABLE")
        return ("done", 0, '{"metric": "x", "value": 3.0}\n', "")

    monkeypatch.setattr(bench, "_run_attempt", fake_attempt)
    rc = bench.run_with_retry(_Args(), ["--model", "tsf_b"], backoff_s=0.0)
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    assert len(calls) == 2
    assert len(out) == 1  # exactly one stdout line
    assert json.loads(out[0]) == {"metric": "x", "value": 3.0}
    assert "--_inner" in calls[0]


def test_implausibly_slow_record_retries_and_keeps_best(monkeypatch,
                                                        capsys):
    """A 'successful' run ~90x below every healthy MFU is a tunnel
    artifact (round-5 degradation window: a known-260.9 ms/step config
    measured 23.9 s/step) — retry, then print the best MEASURED record
    once a plausible one lands."""
    calls = []

    def fake_attempt(cmd, init_timeout_s, run_timeout_s):
        calls.append(cmd)
        if len(calls) < 2:
            return ("done", 0, json.dumps(
                {"metric": "tsf_b_pretrain_clips_per_sec_per_chip",
                 "value": 1.9, "unit": "clips/sec/chip",
                 "vs_baseline": 0.0055}) + "\n", "")
        return ("done", 0, json.dumps(
            {"metric": "tsf_b_pretrain_clips_per_sec_per_chip",
             "value": 174.0, "unit": "clips/sec/chip",
             "vs_baseline": 0.5049}) + "\n", "")

    monkeypatch.setattr(bench, "_run_attempt", fake_attempt)
    rc = bench.run_with_retry(_Args(), [], attempts=3, backoff_s=0.0)
    cap = capsys.readouterr()
    out = cap.out.strip().splitlines()
    assert rc == 0
    assert len(calls) == 2
    assert len(out) == 1
    assert json.loads(out[0])["value"] == 174.0
    assert "plausibility floor" in cap.err


def test_all_attempts_implausible_keeps_best_flagged(monkeypatch, capsys):
    """If the degradation outlasts every attempt, the best measured
    record is still printed (a real number beats an error line) with a
    'suspect' flag, rc 0."""
    vals = iter([1.9, 2.4, 2.1])

    def fake_attempt(cmd, init_timeout_s, run_timeout_s):
        v = next(vals)
        return ("done", 0, json.dumps(
            {"metric": "tsf_b_pretrain_clips_per_sec_per_chip",
             "value": v, "unit": "clips/sec/chip",
             "vs_baseline": v / 344.0}) + "\n", "")

    monkeypatch.setattr(bench, "_run_attempt", fake_attempt)
    rc = bench.run_with_retry(_Args(), [], attempts=3, backoff_s=0.0)
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec["value"] == 2.4  # best of the three, never fabricated
    assert rec["suspect"] == "tunnel-degradation"


def test_plausibility_check_skips_other_units():
    """Narrator/data records carry different vs_baseline semantics —
    the MFU floor must not apply to them."""
    assert not bench._implausibly_slow(
        {"unit": "narrations/sec", "vs_baseline": 0.01})
    assert not bench._implausibly_slow(
        {"unit": "clips/sec/core", "vs_baseline": 0.01})
    assert bench._implausibly_slow(
        {"unit": "clips/sec/chip", "vs_baseline": 0.01})
    assert not bench._implausibly_slow(
        {"unit": "clips/sec/chip", "vs_baseline": 0.26})


def test_persistent_failure_emits_one_error_line(monkeypatch, capsys):
    def fake_attempt(cmd, init_timeout_s, run_timeout_s):
        return ("done", 1, "Traceback (most recent call last):\n  boom\n",
                "RuntimeError: Unable to initialize backend 'axon'")

    monkeypatch.setattr(bench, "_run_attempt", fake_attempt)
    rc = bench.run_with_retry(_Args(), [], attempts=3, backoff_s=0.0)
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 1
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec["metric"] == "tsf_b_pretrain_clips_per_sec_per_chip"
    assert rec["value"] == 0.0
    assert "UNAVAILABLE" in rec["error"] or "axon" in rec["error"]


def test_empty_output_failure_is_described(monkeypatch, capsys):
    def fake_attempt(cmd, init_timeout_s, run_timeout_s):
        return ("done", 1, "", "")

    monkeypatch.setattr(bench, "_run_attempt", fake_attempt)
    rc = bench.run_with_retry(_Args(), [], attempts=1, backoff_s=0.0)
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 1
    assert "rc=1 with empty output" in json.loads(out[0])["error"]


def test_init_timeout_retries(monkeypatch, capsys):
    calls = []

    def fake_attempt(cmd, init_timeout_s, run_timeout_s):
        calls.append(cmd)
        return ("init-timeout", None, "", "")

    monkeypatch.setattr(bench, "_run_attempt", fake_attempt)
    rc = bench.run_with_retry(_Args(), [], attempts=2, backoff_s=0.0)
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 1
    assert len(calls) == 2  # init-phase kills are retried
    assert len(out) == 1
    assert "init" in json.loads(out[0])["error"]


def test_post_init_timeout_does_not_retry(monkeypatch, capsys):
    calls = []

    def fake_attempt(cmd, init_timeout_s, run_timeout_s):
        calls.append(cmd)
        return ("run-timeout", None, "", "[bench] backend ready: axon x1\n")

    monkeypatch.setattr(bench, "_run_attempt", fake_attempt)
    rc = bench.run_with_retry(_Args(), [], attempts=3, backoff_s=0.0)
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 1
    assert len(calls) == 1  # NEVER pile attempts onto a congested tunnel
    assert len(out) == 1
    assert "not retrying" in json.loads(out[0])["error"]


def test_run_attempt_real_subprocess_phases(tmp_path):
    """_run_attempt against real child processes (no TPU involved)."""
    # done: child prints the sentinel then a record and exits 0
    code = ("import sys;"
            f"print({bench._INIT_SENTINEL!r} + ' cpu x1', file=sys.stderr);"
            "print('{\"metric\": \"m\", \"value\": 1.0}')")
    phase, rc, out, err = bench._run_attempt(
        [sys.executable, "-c", code], init_timeout_s=30, run_timeout_s=30)
    assert phase == "done" and rc == 0
    assert bench._extract_json_line(out)
    assert bench._INIT_SENTINEL in err

    # init-timeout: child never prints the sentinel
    phase, rc, _, _ = bench._run_attempt(
        [sys.executable, "-c", "import time; time.sleep(60)"],
        init_timeout_s=1, run_timeout_s=60, poll_s=0.2)
    assert phase == "init-timeout" and rc is None

    # run-timeout: sentinel printed, then the child hangs. NB the
    # pre-init phase is capped by min(init, run) timeouts, so run_timeout
    # must leave slack for interpreter startup under a loaded machine —
    # 2 s flaked when a TPU sweep and the suite shared the box.
    code = ("import sys, time;"
            f"print({bench._INIT_SENTINEL!r} + ' cpu x1', file=sys.stderr,"
            "flush=True); time.sleep(60)")
    phase, rc, _, err = bench._run_attempt(
        [sys.executable, "-c", code],
        init_timeout_s=30, run_timeout_s=8, poll_s=0.2)
    assert phase == "run-timeout" and rc is None


@pytest.mark.parametrize("argv", [
    ["--narrator", "--frames", "16"],
    ["--data", "--frames", "16"],
    ["--bf16-params"],
    # 'full' must not be exempt: tsf_b at 4 frames never remats, so the
    # flag would be silently dropped by main() (advisor-class bug)
    ["--remat-policy", "full"],
])
def test_inapplicable_flags_exit_2(argv):
    """Flags that would be silently ignored exit 2 with an explanation
    instead (advisor r4): --frames only shapes the dual-encoder bench."""
    import subprocess
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), *argv],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "JAX_PLATFORM_NAME": "cpu",
             "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 2
    assert proc.stdout.strip() == ""  # nothing that looks like a record
    assert "only applies" in proc.stderr


def test_16f_default_batches():
    """--frames 16 must pick each geometry's measured batch_16f (the
    4-frame default batches OOM at 16 frames on the 16 GB v5e)."""
    for key, frames, expect in [("tsf_b", 4, 16), ("tsf_b", 16, 4),
                                ("tsf_l", 4, 8), ("tsf_l", 16, 2),
                                ("tsf_l_336", 16, 1)]:
        g = bench.BENCH_MODELS[key]
        got = g["batch_16f"] if frames > 4 else g["batch"]
        assert got == expect, (key, frames, got)


def test_chip_clips_per_sec_reads_newest_bench_record(tmp_path):
    """--data's vs_baseline chip rate tracks the newest driver-recorded
    BENCH_r*.json instead of a hand-synced constant (round-4 weak #5)."""
    def write(n, parsed):
        (tmp_path / f"BENCH_r{n:02d}.json").write_text(
            json.dumps({"n": n, "rc": 0 if parsed else 1, "parsed": parsed}))

    # empty dir → constant fallback
    assert bench.chip_clips_per_sec(str(tmp_path)) == bench.CHIP_CLIPS_PER_SEC
    write(2, {"metric": "tsf_b_pretrain_clips_per_sec_per_chip",
              "value": 173.75, "unit": "clips/sec/chip"})
    write(4, {"metric": "tsf_b_pretrain_clips_per_sec_per_chip",
              "value": 174.02, "unit": "clips/sec/chip"})
    assert bench.chip_clips_per_sec(str(tmp_path)) == 174.02
    # newest round failed (parsed null) → previous good round wins
    write(5, None)
    assert bench.chip_clips_per_sec(str(tmp_path)) == 174.02
    # a non-headline metric in the newest round doesn't poison the scan
    write(6, {"metric": "narrator_decode_narrations_per_sec", "value": 184.0})
    assert bench.chip_clips_per_sec(str(tmp_path)) == 174.02
    # malformed file is skipped
    (tmp_path / "BENCH_r07.json").write_text("{broken")
    assert bench.chip_clips_per_sec(str(tmp_path)) == 174.02
    # the real repo checkout should resolve to a positive number too
    assert bench.chip_clips_per_sec() > 0


@pytest.mark.parametrize("argv,metric", [
    (["--narrator"], "narrator_decode_narrations_per_sec"),
    (["--narrator", "--decoder", "xl"],
     "narrator_xl_decode_narrations_per_sec"),
    (["--data"], "input_pipeline_clips_per_sec_per_core"),
    (["--model", "tsf_l"], "tsf_l_pretrain_clips_per_sec_per_chip"),
    (["--frames", "16"], "tsf_b_16f_pretrain_clips_per_sec_per_chip"),
])
def test_metric_name_matches_mode(argv, metric):
    class A:
        narrator = "--narrator" in argv
        data = "--data" in argv
        model = argv[argv.index("--model") + 1] if "--model" in argv \
            else "tsf_b"
        decoder = argv[argv.index("--decoder") + 1] if "--decoder" in argv \
            else "base"
        frames = int(argv[argv.index("--frames") + 1]) \
            if "--frames" in argv else 4
    assert bench._metric_name(A()) == metric
