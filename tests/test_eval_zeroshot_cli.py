"""End-to-end eval_zeroshot CLI on synthetic fixtures (MINI model)."""

import json
import os
import os.path as osp
import pickle

import numpy as np
import pytest

from lavila_tpu.data.video import encode_test_video


@pytest.fixture()
def ek100_fixture(tmp_path):
    """NON-square EK-100 MIR fixture: 4 video rows, two of which (2, 3)
    share a narration, so the sentence csv has 3 unique sentences and
    the relevancy matrix is (4, 3).  This is the real EK-100 shape
    (9668 videos x 3801 sentences) — a square fixture hides any eval
    that skips the reference's sentence-csv column selection
    (reference eval_zeroshot.py:176-179)."""
    root = tmp_path / "vids"
    (root / "P01").mkdir(parents=True)
    encode_test_video(str(root / "P01" / "P01_01.MP4"), 64, 64, 30, 120)
    header = ("narration_id,participant_id,video_id,narration_timestamp,"
              "start_timestamp,stop_timestamp,start_frame,stop_frame,"
              "narration,verb,verb_class,noun,noun_class,all_nouns,"
              "all_noun_classes\n")
    narrs = ["narration 0", "narration 1", "narration 2", "narration 2"]
    rows = [
        f"P01_{i},P01,P01_01,00:00:00.0,00:00:0{i}.0,00:00:0{i + 2}.0,"
        f"0,60,{narrs[i]},verb,0,noun,{i},[],[]\n"
        for i in range(4)
    ]
    meta = tmp_path / "EPIC_100_retrieval_test.csv"
    meta.write_text(header + "".join(rows))
    # one row per UNIQUE sentence; first column is the narration id of a
    # video row carrying that sentence (videos 2 and 3 share P01_2's)
    sent = tmp_path / "EPIC_100_retrieval_test_sentence.csv"
    sent.write_text("narration_id,narration\n" + "".join(
        f"P01_{i},{narrs[i]}\n" for i in range(3)))
    rel_dir = tmp_path / "relevancy"
    rel_dir.mkdir()
    rel = np.zeros((4, 3), dtype=np.float32)
    for i in range(4):
        rel[i, min(i, 2)] = 1.0
    with open(rel_dir / "caption_relevancy_EPIC_100_retrieval_test.pkl",
              "wb") as f:
        pickle.dump(rel, f)
    return str(root), str(meta)


def test_eval_ek100_mir_cli(ek100_fixture):
    root, meta = ek100_fixture
    from cli.eval_zeroshot import get_args_parser, main
    args = get_args_parser().parse_args([
        "--dataset", "ek100_mir", "--root", root, "--metadata", meta,
        "--model", "CLIP_OPENAI_TIMESFORMER_MINI", "--clip-length", "4",
        "--batch-size", "2", "--workers", "2"])
    out = main(args)
    for k in ("mAP_avg", "nDCG_avg"):
        assert 0.0 <= out[k] <= 1.0


def test_eval_ek100_mir_sentence_column_selection(ek100_fixture,
                                                  monkeypatch):
    """The scored similarity matrix must be (n_videos, n_sentences) with
    columns selected via the sentence csv — videos 2 and 3 share one
    sentence, so the 4x4 raw matrix becomes 4x3 and the shared
    sentence's column comes from video row 2 (its representative
    narration id).  Skipping the selection (pre-fix behavior) feeds a
    4x4 matrix to a (4, 3) relevancy matrix and IndexErrors."""
    root, meta = ek100_fixture
    import cli.eval_zeroshot as ez
    from lavila_tpu.eval import metrics as M
    seen = []
    orig = M.retrieval_map

    def spy(sim, rel):
        seen.append((sim.shape, rel.shape))
        return orig(sim, rel)

    monkeypatch.setattr(ez.M, "retrieval_map", spy)
    args = ez.get_args_parser().parse_args([
        "--dataset", "ek100_mir", "--root", root, "--metadata", meta,
        "--model", "CLIP_OPENAI_TIMESFORMER_MINI", "--clip-length", "4",
        "--batch-size", "2", "--workers", "2"])
    out = ez.main(args)
    assert seen == [((4, 3), (4, 3))]
    assert np.isfinite(out["mAP_avg"])


def test_eval_ek100_mir_list_narrations(ek100_fixture, monkeypatch):
    """--narration-selection list with list-valued metadata narrations:
    the eval scores every narration ((V, V·n) embeddings) and pools to
    (V, V) before the sentence-csv column selection (reference
    eval_zeroshot.py:316-333 + 174-190).  Stock EPIC csvs carry one
    narration per row; here the parser is patched to return 2-lists,
    standing in for rephraser-style metadata."""
    root, meta = ek100_fixture
    import cli.eval_zeroshot as ez
    from lavila_tpu.data import datasets as D

    orig = D.parse_ek100_metadata

    def with_lists(root_, metadata_):
        return [s[:3] + ([s[3], s[3] + " rephrased"],) + s[4:]
                for s in orig(root_, metadata_)]

    monkeypatch.setattr(D, "parse_ek100_metadata", with_lists)
    seen = []
    orig_map = ez.M.retrieval_map

    def spy(sim, rel):
        seen.append((sim.shape, rel.shape))
        return orig_map(sim, rel)

    monkeypatch.setattr(ez.M, "retrieval_map", spy)
    args = ez.get_args_parser().parse_args([
        "--dataset", "ek100_mir", "--root", root, "--metadata", meta,
        "--model", "CLIP_OPENAI_TIMESFORMER_MINI", "--clip-length", "4",
        "--batch-size", "2", "--workers", "2",
        "--narration-selection", "list", "--narration-pool", "max"])
    out = ez.main(args)
    # pooled over n=2 narrations back to (V, sentences) before scoring
    assert seen == [((4, 3), (4, 3))]
    assert np.isfinite(out["mAP_avg"])


def test_embed_dataset_multiple_narrations(tmp_path):
    """narration_selection='list': ego4d samples carrying n narrations
    produce (B, n, L) token batches; embed_dataset flattens them so the
    text embedding matrix has V*n rows and reports n, enabling the
    (V, V, n) similarity protocol (reference eval_zeroshot.py:316-333)."""
    import jax
    from cli.eval_zeroshot import embed_dataset
    from lavila_tpu.data.datasets import DatasetConfig, VideoCaptionDataset
    from lavila_tpu.data.loader import DataLoader
    from lavila_tpu.data.tokenizers import generate_tokenizer
    from lavila_tpu.models import build_model
    import jax.numpy as jnp

    samples = [("synthetic", 0.0, 2.0,
                [f"first narration {i}", f"second narration {i}"])
               for i in range(4)]
    meta = tmp_path / "ego4d_val.pkl"
    with open(meta, "wb") as f:
        pickle.dump(samples, f)

    root = tmp_path / "vids"
    (root / "synthetic.mp4").mkdir(parents=True)
    encode_test_video(str(root / "synthetic.mp4" / "0.mp4"), 64, 64, 30, 90)

    tok = generate_tokenizer("CLIP_OPENAI_TIMESFORMER_MINI")
    model = build_model("CLIP_OPENAI_TIMESFORMER_MINI")
    frames = jnp.zeros((1, 4, 64, 64, 3), jnp.float32)
    text = jnp.zeros((1, 77), jnp.int32)
    variables = {"params": model.init(
        jax.random.key(0), frames, text)["params"]}

    dcfg = DatasetConfig(dataset="ego4d", root=str(root), metadata=str(meta),
                         clip_length=4, narration_selection="list")
    ds = VideoCaptionDataset(dcfg, None, tok, is_training=False)
    loader = DataLoader(ds, 2, shuffle=False, drop_last=False,
                        num_workers=0)
    v, t, n_narr = embed_dataset(model, variables, loader)
    assert n_narr == 2
    assert v.shape[0] == 4 and t.shape[0] == 8
    sim = (v @ t.T).reshape(4, 4, 2)
    pooled = sim.max(axis=2)
    assert pooled.shape == (4, 4)
    assert np.all(pooled >= sim[:, :, 0] - 1e-6)


def test_eval_ek100_mir_cli_multiview(ek100_fixture, monkeypatch):
    """--num-clips/--num-crops: multi-view MIR protocol
    (reference eval_zeroshot.py:117-125) — per-view embeddings are
    mean-pooled, so the similarity matrix keeps its (videos, texts)
    shape while each view batch is (B, clips*crops, T, H, W, C).
    num-crops 6 exercises the flipped 3-crop protocol end-to-end
    (reference video_transforms.py:147-154)."""
    root, meta = ek100_fixture
    from cli import eval_zeroshot as ez
    seen_shapes = []
    orig = ez.embed_dataset

    def spy(model, variables, loader, has_mask=False):
        it = iter(loader)
        first = next(it)
        seen_shapes.append(np.asarray(first["frames"]).shape)
        return orig(model, variables, loader, has_mask)

    monkeypatch.setattr(ez, "embed_dataset", spy)
    args = ez.get_args_parser().parse_args([
        "--dataset", "ek100_mir", "--root", root, "--metadata", meta,
        "--model", "CLIP_OPENAI_TIMESFORMER_MINI", "--clip-length", "4",
        "--num-clips", "2", "--num-crops", "6",
        "--batch-size", "2", "--workers", "2"])
    out = ez.main(args)
    assert seen_shapes[0][1:3] == (12, 4)  # 2 clips x (3+3 flipped), T=4
    for k in ("mAP_avg", "nDCG_avg"):
        assert 0.0 <= out[k] <= 1.0


@pytest.fixture()
def mcq_fixture(tmp_path):
    root = tmp_path / "vids"
    vdir = root / "clip01.mp4"
    vdir.mkdir(parents=True)
    encode_test_video(str(vdir / "0.mp4"), 64, 64, 30, 150)
    items = {}
    for i in range(2):
        items[str(i)] = {
            "query": {"clip_text": f"query text {i}"},
            "choices": {
                str(j): {"video_uid": "clip01", "clip_start": 0.2 * j,
                         "clip_end": 0.2 * j + 2.0,
                         "clip_text": f"option {j}"}
                for j in range(3)
            },
            "answer": i % 3,
            "types": 1 + (i % 2),
        }
    meta = tmp_path / "mcq.json"
    meta.write_text(json.dumps(items))
    return str(root), str(meta)


def test_eval_mcq_cli(mcq_fixture):
    root, meta = mcq_fixture
    from cli.eval_zeroshot import get_args_parser, main
    args = get_args_parser().parse_args([
        "--dataset", "ego4d_mcq", "--root", root, "--metadata", meta,
        "--model", "CLIP_OPENAI_TIMESFORMER_MINI", "--clip-length", "4",
        "--batch-size", "2", "--workers", "2"])
    out = main(args)
    assert "Intra-video" in out and "Inter-video" in out


@pytest.fixture()
def egtea_fixture(tmp_path):
    root = tmp_path / "vids"
    (root / "P01-R01-VID").mkdir(parents=True)
    encode_test_video(str(root / "P01-R01-VID" / "P01-R01-VID-CLIP.mp4"),
                      64, 64, 30, 80)
    actions = tmp_path / "action_idx.txt"
    actions.write_text("Cut_tomato 1\nPour_water 2\n")
    split = tmp_path / "test_split1.txt"
    split.write_text("P01-R01-VID-CLIP 1 x\n")
    return str(root), str(split), str(actions)


def test_eval_egtea_cli(egtea_fixture):
    root, split, actions = egtea_fixture
    from cli.eval_zeroshot import get_args_parser, main
    args = get_args_parser().parse_args([
        "--dataset", "egtea", "--root", root, "--metadata", split,
        "--metadata-val", split,
        "--model", "CLIP_OPENAI_TIMESFORMER_MINI", "--clip-length", "4",
        "--clip-stride", "2", "--batch-size", "2", "--workers", "2"])
    # label metadata path: the CLI reads labels from action_idx.txt
    args.metadata = split
    import cli.eval_zeroshot as ez
    from lavila_tpu.data.label_maps import generate_label_map
    labels, mapping = generate_label_map("egtea", metadata=actions)
    model, variables, tokenizer, model_name = \
        ez.load_model_from_checkpoint(args)
    out = ez.eval_classification(args, model, variables, tokenizer,
                                 model_name, labels, mapping)
    assert "mean_class_acc" in out


def test_eval_egtea_cli_sparse_sample(egtea_fixture, monkeypatch):
    """--sparse-sample must reach the dataset config (it was read via
    getattr but never defined on the CLI, so it was silently always
    False — reference eval_zeroshot.py:49 exposes it for the EGTEA/CLS
    sparse protocol)."""
    root, split, actions = egtea_fixture
    import cli.eval_zeroshot as ez
    from lavila_tpu.data.label_maps import generate_label_map

    seen_cfgs = []
    orig_cls = ez.VideoClassyDataset

    class SpyDataset(orig_cls):
        def __init__(self, cfg, *a, **k):
            seen_cfgs.append(cfg)
            super().__init__(cfg, *a, **k)

    monkeypatch.setattr(ez, "VideoClassyDataset", SpyDataset)
    args = ez.get_args_parser().parse_args([
        "--dataset", "egtea", "--root", root, "--metadata", split,
        "--metadata-val", split, "--sparse-sample", "--num-clips", "2",
        "--model", "CLIP_OPENAI_TIMESFORMER_MINI", "--clip-length", "4",
        "--clip-stride", "2", "--batch-size", "2", "--workers", "2"])
    labels, mapping = generate_label_map("egtea", metadata=actions)
    model, variables, tokenizer, model_name = \
        ez.load_model_from_checkpoint(args)
    out = ez.eval_classification(args, model, variables, tokenizer,
                                 model_name, labels, mapping)
    assert "mean_class_acc" in out
    assert len(seen_cfgs) == 1 and seen_cfgs[0].sparse_sample is True


def test_eval_cli_loads_released_style_torch_checkpoint(ek100_fixture,
                                                        tmp_path):
    """--checkpoint foo.pt: a torch-layout dual-encoder checkpoint (MINI
    geometry) loads through the importer and drives the eval CLI."""
    import torch
    from tests.test_full_checkpoint_import import (torch_clip_text_sd,
                                                   torch_timesformer_sd)
    # MINI geometry: img 64/patch16 -> pos_embed 17; depth 2; text w64/l2
    sd = torch_timesformer_sd("visual.", depth=2, D=64, P=16, IMG=64, F=4)
    sd.update(torch_clip_text_sd(layers=2, W=64, V=49408, ctx=77, E=256))
    sd["image_projection"] = np.zeros((64, 256), np.float32)
    ckpt_path = tmp_path / "released.pt"
    torch.save({"state_dict": {k: torch.tensor(v) for k, v in sd.items()},
                "epoch": 0}, str(ckpt_path))

    root, meta = ek100_fixture
    from cli.eval_zeroshot import get_args_parser, main
    args = get_args_parser().parse_args([
        "--dataset", "ek100_mir", "--root", root, "--metadata", meta,
        "--model", "CLIP_OPENAI_TIMESFORMER_MINI", "--clip-length", "4",
        "--checkpoint", str(ckpt_path), "--batch-size", "2",
        "--workers", "2"])
    out = main(args)
    assert np.isfinite(out["mAP_avg"])


def test_eval_charades_ego_cli(tmp_path):
    """Charades-Ego untrimmed multilabel video mAP through the CLI path."""
    root = tmp_path / "vids"
    root.mkdir()
    encode_test_video(str(root / "VID1EGO.mp4"), 64, 64, 30, 90)
    meta = tmp_path / "CharadesEgo_v1_test_only1st.csv"
    meta.write_text(
        "id,subject,scene,quality,relevance,verified,script,objects,"
        "descriptions,actions,length\n"
        "VID1EGO,s,Kitchen,5,5,Yes,script,objects,desc,"
        "c092 0.5 2.0;c147 0.2 2.5,3.0\n")
    classes = tmp_path / "Charades_v1_classes.txt"
    classes.write_text("c092 someone is cooking\nc147 someone is eating\n"
                       "c100 someone is running\n")

    import cli.eval_zeroshot as ez
    from lavila_tpu.data.label_maps import generate_label_map
    args = ez.get_args_parser().parse_args([
        "--dataset", "charades_ego", "--root", str(root),
        "--metadata", str(meta), "--metadata-val", str(meta),
        "--model", "CLIP_OPENAI_TIMESFORMER_MINI", "--clip-length", "4",
        "--clip-stride", "2", "--batch-size", "2", "--workers", "2"])
    labels, mapping = generate_label_map("charades_ego",
                                         metadata=str(classes))
    model, variables, tokenizer, model_name = \
        ez.load_model_from_checkpoint(args)
    out = ez.eval_classification(args, model, variables, tokenizer,
                                 model_name, labels, mapping,
                                 multilabel=True)
    assert "video_mAP" in out and np.isfinite(out["video_mAP"])


def test_cls_use_template_expands_prompts(egtea_fixture, monkeypatch):
    """--cls-use-template wraps every label in the two egocentric
    templates before encoding (reference eval_zeroshot.py:134-137)."""
    root, split, actions = egtea_fixture
    import cli.eval_zeroshot as ez
    from lavila_tpu.data.label_maps import generate_label_map
    seen = []
    orig_tok = None

    args = ez.get_args_parser().parse_args([
        "--dataset", "egtea", "--root", root, "--metadata", split,
        "--metadata-val", split, "--cls-use-template",
        "--model", "CLIP_OPENAI_TIMESFORMER_MINI", "--clip-length", "4",
        "--clip-stride", "2", "--batch-size", "2", "--workers", "2"])
    labels, mapping = generate_label_map("egtea", metadata=actions)
    model, variables, tokenizer, model_name = \
        ez.load_model_from_checkpoint(args)

    class SpyTok:
        def __call__(self, texts):
            seen.append(list(texts) if isinstance(texts, list) else texts)
            return tokenizer(texts)

    out = ez.eval_classification(args, model, variables, SpyTok(),
                                 model_name, labels, mapping)
    assert "mean_class_acc" in out
    # first label call: both templates applied
    first = seen[0]
    assert any(v.startswith("#C C ") for v in first)
    assert any(v.startswith("#C ") and not v.startswith("#C C ")
               for v in first)


def test_eval_ek100_mir_explicit_relevancy_path(ek100_fixture, tmp_path):
    """--relevancy-path overrides the derived pkl location (reference
    main_finetune_retrieval.py:54/:554; this flag was parsed but IGNORED
    before round 4 — regression-guard that it actually reaches the
    loader)."""
    import shutil

    root, meta = ek100_fixture
    moved = tmp_path / "elsewhere.pkl"
    derived = osp.join(osp.dirname(meta), "relevancy",
                       "caption_relevancy_EPIC_100_retrieval_test.pkl")
    shutil.move(derived, moved)  # derived location now empty

    from cli.eval_zeroshot import get_args_parser, main
    argv = ["--dataset", "ek100_mir", "--root", root, "--metadata", meta,
            "--model", "CLIP_OPENAI_TIMESFORMER_MINI", "--clip-length",
            "4", "--batch-size", "2", "--workers", "2"]
    with pytest.raises(FileNotFoundError):
        main(get_args_parser().parse_args(argv))
    out = main(get_args_parser().parse_args(
        argv + ["--relevancy-path", str(moved)]))
    assert 0.0 <= out["mAP_avg"] <= 1.0


def test_eval_zeroshot_output_dir_best_fallback(ek100_fixture, tmp_path,
                                                monkeypatch):
    """No --checkpoint: load checkpoint_best from --output-dir (reference
    eval_zeroshot.py:61-64 precedence)."""
    root, meta = ek100_fixture
    from cli.eval_zeroshot import get_args_parser, load_model_from_checkpoint

    # precedence only (no weights on disk): resume beats output-dir
    args = get_args_parser().parse_args(
        ["--dataset", "ek100_mir", "--root", root, "--metadata", meta,
         "--model", "CLIP_OPENAI_TIMESFORMER_MINI", "--clip-length", "4"])
    args.resume = ""
    args.output_dir = str(tmp_path)
    (tmp_path / "checkpoint_best").mkdir()  # orbax ckpts are dirs
    (tmp_path / "checkpoint_best.json").write_text(json.dumps(
        {"config": {"model": "CLIP_OPENAI_TIMESFORMER_MINI",
                    "clip_length": 4}}))
    seen = {}

    import lavila_tpu.utils.checkpoints as C

    class FakeMgr:
        def __init__(self, d):
            seen["dir"] = d

        def restore(self, target, tag):
            seen["tag"] = tag
            return target, {}

    monkeypatch.setattr(C, "CheckpointManager", FakeMgr)
    import cli.eval_zeroshot as Z
    monkeypatch.setattr(Z, "CheckpointManager", FakeMgr, raising=False)
    load_model_from_checkpoint(args)
    assert args.checkpoint == str(tmp_path / "checkpoint_best")
    assert seen.get("tag") == args.checkpoint
