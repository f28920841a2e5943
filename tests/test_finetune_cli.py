"""Fine-tune CLI end-to-end tests: per-epoch validation, best-checkpoint
tracking, and auto-resume (reference main_finetune_retrieval.py:182-217,
319-320; main_finetune_classification.py:416+)."""

import json
import os.path as osp
import pickle

import numpy as np
import pytest

from lavila_tpu.data.video import encode_test_video


@pytest.fixture()
def charades_fixture(tmp_path):
    """Trimmed train pkl + untrimmed val csv + classes file sharing one
    synthetic video."""
    root = tmp_path / "vids"
    root.mkdir()
    encode_test_video(str(root / "VID1EGO.mp4"), 64, 64, 30, 120)
    train_pkl = tmp_path / "charades_train.pkl"
    with open(train_pkl, "wb") as f:
        pickle.dump([("VID1EGO", 0.2 + 0.3 * i, 1.5 + 0.3 * i,
                      f"someone is doing action {i}") for i in range(8)], f)
    val_csv = tmp_path / "CharadesEgo_v1_test_only1st.csv"
    val_csv.write_text(
        "id,subject,scene,quality,relevance,verified,script,objects,"
        "descriptions,actions,length\n"
        "VID1EGO,s,Kitchen,5,5,Yes,script,objects,desc,"
        "c092 0.5 2.0;c147 0.2 2.5,3.0\n")
    classes = tmp_path / "Charades_v1_classes.txt"
    classes.write_text("c092 someone is cooking\nc147 someone is eating\n"
                       "c100 someone is running\n")
    return str(root), str(train_pkl), str(val_csv), str(classes)


def _retrieval_args(tmp_path, fixture, epochs=1):
    root, train_pkl, val_csv, classes = fixture
    from cli.main_finetune_retrieval import get_args_parser
    return get_args_parser().parse_args([
        "--dataset", "charades_ego", "--root", root,
        "--metadata", train_pkl, "--metadata-val", val_csv,
        "--label-metadata", classes,
        "--model", "CLIP_OPENAI_TIMESFORMER_MINI", "--clip-length", "4",
        "--clip-stride", "2", "--batch-size", "8", "--workers", "2",
        "--epochs", str(epochs), "--eval-freq", "1",
        "--output-dir", str(tmp_path / "run")])


def test_finetune_retrieval_charades_validation(tmp_path, charades_fixture):
    """--dataset charades_ego: trains CLIP loss on trimmed clips and
    validates per-epoch with multilabel video mAP; best checkpoint kept
    (reference main_finetune_retrieval.py:319-320, 368-369)."""
    from cli.main_finetune_retrieval import main
    main(_retrieval_args(tmp_path, charades_fixture))
    log = (tmp_path / "run" / "log.txt").read_text().strip().splitlines()
    rec = json.loads(log[-1])
    assert "video_mAP" in rec and np.isfinite(rec["video_mAP"])
    assert (tmp_path / "run" / "checkpoint_best").exists()
    meta = json.loads(
        (tmp_path / "run" / "checkpoint_best.json").read_text())
    assert meta["metrics"]["best_metric"] == rec["video_mAP"]


def test_finetune_retrieval_auto_resume(tmp_path, charades_fixture):
    """Second invocation of the same output dir resumes at epoch 1 with
    the best metric restored (reference :202-217)."""
    from cli.main_finetune_retrieval import main
    main(_retrieval_args(tmp_path, charades_fixture, epochs=1))
    meta0 = json.loads(
        (tmp_path / "run" / "checkpoint_latest.json").read_text())
    assert meta0["epoch"] == 0
    main(_retrieval_args(tmp_path, charades_fixture, epochs=2))
    meta1 = json.loads(
        (tmp_path / "run" / "checkpoint_latest.json").read_text())
    assert meta1["epoch"] == 1  # resumed, did NOT retrain epoch 0
    assert np.isfinite(meta1["metrics"]["best_metric"])


@pytest.fixture()
def egtea_cls_fixture(tmp_path):
    root = tmp_path / "vids"
    (root / "P01-R01-VID").mkdir(parents=True)
    encode_test_video(str(root / "P01-R01-VID" / "P01-R01-VID-CLIP.mp4"),
                      64, 64, 30, 80)
    actions = tmp_path / "action_idx.txt"
    actions.write_text("Cut_tomato 1\nPour_water 2\n")
    split = tmp_path / "train_split1.txt"
    split.write_text("".join(
        f"P01-R01-VID-CLIP {1 + i % 2} x\n" for i in range(8)))
    return str(root), str(split), str(actions)


def _cls_args(tmp_path, fixture, epochs=1):
    root, split, actions = fixture
    from cli.main_finetune_classification import get_args_parser
    return get_args_parser().parse_args([
        "--dataset", "egtea", "--root", root,
        "--metadata-train", split, "--metadata-val", split,
        "--label-metadata", actions,
        "--model", "CLIP_OPENAI_TIMESFORMER_MINI", "--clip-length", "4",
        "--clip-stride", "2", "--batch-size", "8", "--workers", "2",
        "--epochs", str(epochs), "--eval-freq", "1",
        "--output-dir", str(tmp_path / "run")])


def test_finetune_classification_per_epoch_val_and_resume(
        tmp_path, egtea_cls_fixture):
    """Per-epoch validation lands in log.txt with best tracking; a second
    run auto-resumes past epoch 0."""
    from cli.main_finetune_classification import main
    main(_cls_args(tmp_path, egtea_cls_fixture))
    log = (tmp_path / "run" / "log.txt").read_text().strip().splitlines()
    rec = json.loads(log[-1])
    assert "acc1" in rec and rec["epoch"] == 0
    assert (tmp_path / "run" / "checkpoint_best").exists()

    from cli.main_finetune_classification import main as main2
    main2(_cls_args(tmp_path, egtea_cls_fixture, epochs=2))
    meta = json.loads(
        (tmp_path / "run" / "checkpoint_latest.json").read_text())
    assert meta["epoch"] == 1


def test_finetune_retrieval_evaluate_only(tmp_path, charades_fixture):
    """--evaluate: validates once and exits without training
    (reference main_finetune_retrieval.py:322-327)."""
    from cli.main_finetune_retrieval import main
    args = _retrieval_args(tmp_path, charades_fixture)
    args.evaluate = True
    out = main(args)
    assert "video_mAP" in out
    assert not (tmp_path / "run" / "checkpoint_latest").exists()


def test_finetune_classification_evaluate_only(tmp_path, egtea_cls_fixture):
    from cli.main_finetune_classification import main
    args = _cls_args(tmp_path, egtea_cls_fixture)
    args.evaluate = True
    out = main(args)
    assert "acc1" in out
    assert not (tmp_path / "run" / "checkpoint_latest").exists()


def test_finetune_retrieval_accum_and_frozen_scale(tmp_path,
                                                   charades_fixture):
    """--update-freq accumulates gradients (optax.MultiSteps) and
    logit_scale stays EXACTLY at init — the reference freezes it
    unconditionally for retrieval fine-tuning
    (main_finetune_retrieval.py:142)."""
    import jax.numpy as jnp

    from cli.main_finetune_retrieval import main
    args = _retrieval_args(tmp_path, charades_fixture)
    args.update_freq = 2
    args.fix_lr = True
    args.clip_grad_value = 1.0
    args.freeze_temperature = True  # parity no-op: always frozen anyway
    state = main(args)
    params = state.params
    import math
    assert float(jnp.ravel(params["logit_scale"])[0]) == pytest.approx(
        math.log(1 / 0.07), rel=1e-6)
