"""Distributed narrator inference: 2-"host" shard + merge on CPU.

Verifies the per-rank cache.{rank}.pkl → rank-0 round-robin total.pkl
contract (reference main_infer_narrator.py:141-251) AND that the
(video_uid, captions) pairing comes from the batch-carried global
indices — immune to sampler/shuffle changes.
"""

import pickle

import jax
import pytest

from lavila_tpu.data.video import encode_test_video


@pytest.fixture
def ego4d_fixture(tmp_path):
    uids = [f"vid{i:03d}" for i in range(5)]
    for u in uids:
        vdir = tmp_path / f"{u}.mp4"
        vdir.mkdir()
        encode_test_video(str(vdir / "0.mp4"), 64, 64, 30, 90)
    meta = tmp_path / "meta.pkl"
    with open(meta, "wb") as f:
        pickle.dump([(u, 0.2, 2.0 + i * 0.1, f"narr {i}")
                     for i, u in enumerate(uids)], f)
    return tmp_path, meta, uids


def test_two_shard_infer_and_merge(ego4d_fixture, tmp_path, monkeypatch):
    root, meta, uids = ego4d_fixture
    out = tmp_path / "narr_out"

    from cli.main_infer_narrator import get_args_parser, main
    argv = ["--dataset", "ego4d", "--root", str(root),
            "--metadata", str(meta),
            "--model", "VCLM_OPENAI_TIMESFORMER_MINI_GPT2_MINI",
            "--clip-length", "2", "--batch-size", "2", "--workers", "2",
            "--num-return-sequences", "2", "--output-dir", str(out)]
    args = get_args_parser().parse_args(argv)

    # fake a 2-host run in one process: rank 1 first (no merge), then rank 0
    from jax.experimental import multihost_utils
    monkeypatch.setattr(multihost_utils, "sync_global_devices",
                        lambda name: None)  # real barrier needs real hosts
    for rank in (1, 0):
        monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        main(args)

    with open(out / "total.pkl", "rb") as f:
        merged = pickle.load(f)
    # 5 samples pad to 6 (3 per shard); shard0 = [0,2,4], shard1 = [1,3,0];
    # round-robin merge restores global order with the pad duplicate last
    assert [r[0] for r in merged] == [uids[0], uids[1], uids[2], uids[3],
                                      uids[4], uids[0]]
    for r in merged:
        vid, t_start, t_end, caps, ppls = r
        assert len(caps) == 2 and len(ppls) == 2
        i = uids.index(vid)
        assert t_start == 0.2 and abs(t_end - (2.0 + i * 0.1)) < 1e-6


def test_beam_sample_decoding(ego4d_fixture, tmp_path):
    """--decoding beam_sample routes pseudo-labeling through the
    BeamDecoder with nrs independent per-return beam sets (reference
    main_infer_narrator.py:189-201)."""
    root, meta, uids = ego4d_fixture
    out = tmp_path / "narr_beam_out"

    from cli.main_infer_narrator import get_args_parser, main
    argv = ["--dataset", "ego4d", "--root", str(root),
            "--metadata", str(meta),
            "--model", "VCLM_OPENAI_TIMESFORMER_MINI_GPT2_MINI",
            "--clip-length", "2", "--batch-size", "5", "--workers", "2",
            "--decoding", "beam_sample", "--num-beams", "2",
            "--num-return-sequences", "2", "--max-text-length", "12",
            "--output-dir", str(out)]
    main(get_args_parser().parse_args(argv))

    with open(out / "total.pkl", "rb") as f:
        merged = pickle.load(f)
    assert len(merged) == 5
    for vid, t_start, t_end, caps, scores in merged:
        assert len(caps) == 2 and len(scores) == 2


def test_group_beam_rejects_degenerate_groups(ego4d_fixture, tmp_path):
    root, meta, _ = ego4d_fixture
    from cli.main_infer_narrator import get_args_parser, main
    argv = ["--dataset", "ego4d", "--root", str(root),
            "--metadata", str(meta),
            "--model", "VCLM_OPENAI_TIMESFORMER_MINI_GPT2_MINI",
            "--clip-length", "2", "--decoding", "group_beam",
            "--num-beams", "3", "--num-beam-groups", "1",
            "--output-dir", str(tmp_path / "x")]
    with pytest.raises(SystemExit):
        main(get_args_parser().parse_args(argv))
