"""bench.py driver contract: retry on transient failures, and print
EXACTLY ONE JSON line on stdout whether the bench succeeds or not
(round-3 verdict: a single axon UNAVAILABLE at init must not erase a
round's perf evidence, and the failure path must not print a traceback
to stdout)."""

import json
import os
import subprocess
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

    def fake_run(cmd, capture_output, text, timeout):
        calls.append(cmd)
        if len(calls) < 2:
            return subprocess.CompletedProcess(
                cmd, 1, stdout="",
                stderr="Unable to initialize backend 'axon': UNAVAILABLE")
        return subprocess.CompletedProcess(
            cmd, 0, stdout='{"metric": "x", "value": 3.0}\n', stderr="")

    monkeypatch.setattr(subprocess, "run", fake_run)
    rc = bench.run_with_retry(_Args(), ["--model", "tsf_b"], backoff_s=0.0)
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    assert len(calls) == 2
    assert len(out) == 1  # exactly one stdout line
    assert json.loads(out[0]) == {"metric": "x", "value": 3.0}
    assert "--_inner" in calls[0]


def test_persistent_failure_emits_one_error_line(monkeypatch, capsys):
    def fake_run(cmd, capture_output, text, timeout):
        return subprocess.CompletedProcess(
            cmd, 1, stdout="Traceback (most recent call last):\n  boom\n",
            stderr="RuntimeError: Unable to initialize backend 'axon'")

    monkeypatch.setattr(subprocess, "run", fake_run)
    rc = bench.run_with_retry(_Args(), [], attempts=3, backoff_s=0.0)
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 1
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec["metric"] == "tsf_b_pretrain_clips_per_sec_per_chip"
    assert rec["value"] == 0.0
    assert "UNAVAILABLE" in rec["error"] or "axon" in rec["error"]


def test_timeout_counts_as_attempt(monkeypatch, capsys):
    def fake_run(cmd, capture_output, text, timeout):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", fake_run)
    rc = bench.run_with_retry(_Args(), [], attempts=2, backoff_s=0.0)
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 1
    assert len(out) == 1
    assert "timed out" in json.loads(out[0])["error"]


@pytest.mark.parametrize("argv,metric", [
    (["--narrator"], "narrator_decode_narrations_per_sec"),
    (["--narrator", "--decoder", "xl"],
     "narrator_xl_decode_narrations_per_sec"),
    (["--data"], "input_pipeline_clips_per_sec_per_core"),
    (["--model", "tsf_l"], "tsf_l_pretrain_clips_per_sec_per_chip"),
])
def test_metric_name_matches_mode(argv, metric):
    class A:
        narrator = "--narrator" in argv
        data = "--data" in argv
        model = argv[argv.index("--model") + 1] if "--model" in argv \
            else "tsf_b"
        decoder = argv[argv.index("--decoder") + 1] if "--decoder" in argv \
            else "base"
    assert bench._metric_name(A()) == metric
