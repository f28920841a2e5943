"""End-to-end CLI smoke tests on synthetic data (MINI models, CPU)."""

import json
import os
import pathlib

import numpy as np
import pytest


def test_pretrain_cli_synthetic(tmp_path):
    from cli.main_pretrain import main
    from lavila_tpu.config import PretrainConfig, parse_config
    cfg = parse_config(PretrainConfig, [
        "--dataset", "synthetic", "--model", "CLIP_OPENAI_TIMESFORMER_MINI",
        "--steps", "2", "--batch-size", "8", "--epochs", "1",
        "--clip-length", "4", "--output-dir", str(tmp_path),
        "--print-freq", "1", "--workers", "2", "--disable-amp"])
    state = main(cfg)
    assert int(state.step) == 2
    # checkpoint with embedded config was written
    assert (tmp_path / "checkpoint_latest").exists()
    meta = json.loads((tmp_path / "checkpoint_latest.json").read_text())
    assert meta["config"]["model"] == "CLIP_OPENAI_TIMESFORMER_MINI"


def test_pretrain_auto_resume(tmp_path):
    from cli.main_pretrain import main
    from lavila_tpu.config import PretrainConfig, parse_config
    argv = ["--dataset", "synthetic", "--model",
            "CLIP_OPENAI_TIMESFORMER_MINI", "--steps", "1",
            "--batch-size", "8", "--epochs", "2", "--clip-length", "4",
            "--output-dir", str(tmp_path), "--workers", "2",
            "--disable-amp"]
    main(parse_config(PretrainConfig, argv))
    # second invocation must auto-resume from epoch 1
    state = main(parse_config(PretrainConfig, argv))
    assert (tmp_path / "checkpoint_0001").exists() or \
        (tmp_path / "checkpoint_0000").exists()


def test_vclm_pretrain_cli(tmp_path, monkeypatch):
    """Caption-loss pretrain path (narrator teacher forcing)."""
    _write_gpt2_fixture(tmp_path / "tok")
    monkeypatch.setenv("LAVILA_TOKENIZER_DIR", str(tmp_path / "tok"))
    from cli.main_pretrain import main
    from lavila_tpu.config import PretrainConfig, parse_config
    cfg = parse_config(PretrainConfig, [
        "--dataset", "synthetic", "--model",
        "VCLM_OPENAI_TIMESFORMER_MINI_GPT2_MINI", "--steps", "2",
        "--batch-size", "8", "--epochs", "1", "--clip-length", "4",
        "--output-dir", str(tmp_path / "run"), "--print-freq", "1",
        "--workers", "2", "--disable-amp"])
    state = main(cfg)
    assert int(state.step) == 2


def _write_gpt2_fixture(d: pathlib.Path):
    from lavila_tpu.data.tokenizers import byte_unicode_table
    g = d / "gpt2"
    g.mkdir(parents=True, exist_ok=True)
    vocab = {u: i for i, u in enumerate(byte_unicode_table().values())}
    vocab["<|endoftext|>"] = len(vocab)
    (g / "vocab.json").write_text(json.dumps(vocab))
    (g / "merges.txt").write_text("#version: 0.2\n")


def test_pretrain_with_ek100_probe(tmp_path):
    """Per-epoch zero-shot probe wired into pretraining."""
    import numpy as np
    import pickle
    from lavila_tpu.data.video import encode_test_video
    root = tmp_path / "vids"
    (root / "P01").mkdir(parents=True)
    encode_test_video(str(root / "P01" / "P01_01.MP4"), 64, 64, 30, 120)
    header = ("narration_id,participant_id,video_id,narration_timestamp,"
              "start_timestamp,stop_timestamp,start_frame,stop_frame,"
              "narration,verb,verb_class,noun,noun_class,all_nouns,"
              "all_noun_classes\n")
    rows = [f"P01_{i},P01,P01_01,00:00:00.0,00:00:0{i}.0,00:00:0{i + 2}.0,"
            f"0,60,narr {i},v,0,n,{i},[],[]\n" for i in range(2)]
    meta = tmp_path / "EPIC_100_retrieval_test.csv"
    meta.write_text(header + "".join(rows))
    (tmp_path / "EPIC_100_retrieval_test_sentence.csv").write_text(
        "narration_id,narration\nP01_0,narr 0\nP01_1,narr 1\n")
    (tmp_path / "relevancy").mkdir()
    with open(tmp_path / "relevancy" /
              "caption_relevancy_EPIC_100_retrieval_test.pkl", "wb") as f:
        pickle.dump(np.eye(2, dtype=np.float32), f)

    from cli.main_pretrain import main
    from lavila_tpu.config import PretrainConfig, parse_config
    cfg = parse_config(PretrainConfig, [
        "--dataset", "synthetic", "--model", "CLIP_OPENAI_TIMESFORMER_MINI",
        "--steps", "1", "--batch-size", "8", "--epochs", "1",
        "--clip-length", "4", "--output-dir", str(tmp_path / "run"),
        "--workers", "2", "--disable-amp",
        "--val-metadata", str(meta), "--val-root", str(root)])
    main(cfg)
    import json
    log = (tmp_path / "run" / "log.txt").read_text().strip().splitlines()
    rec = json.loads(log[-1])
    assert "mAP_avg" in rec  # probe metrics landed in the training log
    # first probe improves on -inf -> checkpoint_best kept
    # (reference main_pretrain.py:394-403)
    assert (tmp_path / "run" / "checkpoint_best").exists()
    meta = json.loads(
        (tmp_path / "run" / "checkpoint_best.json").read_text())
    assert meta["metrics"]["best_metric"] == rec["mAP_avg"]


def test_pretrain_ssl_pseudo_temperature(tmp_path):
    """--metadata-aux drives the SSL two-temperature loss:
    logit_scale_pseudo initializes from --pseudo-temperature-init
    (reference main_pretrain.py:106,195 — the CLI default is 0.07, NOT
    SSLCLIPLoss's class default 0.08) and --freeze-pseudo-temperature
    pins it (reference loss.py:142-143)."""
    import math

    from cli.main_pretrain import main
    from lavila_tpu.config import PretrainConfig, parse_config
    cfg = parse_config(PretrainConfig, [
        "--dataset", "synthetic", "--model", "CLIP_OPENAI_TIMESFORMER_MINI",
        "--steps", "2", "--batch-size", "8", "--epochs", "1",
        "--clip-length", "4", "--output-dir", str(tmp_path),
        "--metadata-aux", "synthetic_aux",
        "--pseudo-temperature-init", "0.05",
        "--freeze-pseudo-temperature",
        "--print-freq", "1", "--workers", "2", "--disable-amp"])
    state = main(cfg)
    assert int(state.step) == 2
    got = float(state.criterion_params["logit_scale_pseudo"])
    assert got == pytest.approx(math.log(1 / 0.05), rel=1e-6)


def test_pretrain_ssl_pseudo_temperature_learns_when_unfrozen(tmp_path):
    import math

    from cli.main_pretrain import main
    from lavila_tpu.config import PretrainConfig, parse_config
    cfg = parse_config(PretrainConfig, [
        "--dataset", "synthetic", "--model", "CLIP_OPENAI_TIMESFORMER_MINI",
        "--steps", "2", "--batch-size", "8", "--epochs", "1",
        "--clip-length", "4", "--output-dir", str(tmp_path),
        "--metadata-aux", "synthetic_aux",
        "--print-freq", "1", "--workers", "2", "--disable-amp"])
    state = main(cfg)
    got = float(state.criterion_params["logit_scale_pseudo"])
    assert got != pytest.approx(math.log(1 / 0.07), rel=1e-9)  # updated
