"""Native decode core tests against synthesized deterministic clips."""

import os
import os.path as osp

import numpy as np
import pytest

from lavila_tpu.data.video import (VideoReader, encode_test_video,
                                   video_loader, video_loader_by_frames)


@pytest.fixture(scope="module")
def clip_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("vids") / "test.mp4"
    encode_test_video(str(p), width=64, height=48, fps=30, num_frames=90)
    return str(p)


def expected_luma(k):
    # encoder writes luma Y=(16+3k)%240; decoded RGB is full-range:
    # RGB = (Y-16) * 255/219 (limited-range YUV420P)
    y = (16 + 3 * k) % 240
    return np.clip((y - 16) * 255.0 / 219.0, 0, 255)


def test_probe(clip_path):
    vr = VideoReader(clip_path)
    assert abs(vr.fps - 30.0) < 0.5
    assert len(vr) == 90
    assert vr.shape == (48, 64)
    vr.close()


def test_frame_accurate_random_access(clip_path):
    vr = VideoReader(clip_path)
    ids = [0, 5, 17, 44, 89, 44]  # includes out-of-order + duplicate
    frames = vr.get_batch(ids)
    assert frames.shape == (6, 48, 64, 3)
    for i, k in enumerate(ids):
        # median luma (marker square is tiny); YUV->RGB is ~identity on gray
        got = np.median(frames[i].astype(np.float32))
        want = expected_luma(k)
        assert abs(got - want) < 12, (k, got, want)
    # duplicate index slots must be identical
    np.testing.assert_array_equal(frames[3], frames[5])
    vr.close()


def test_resize_on_decode(clip_path):
    vr = VideoReader(clip_path, out_size=(24, 32))
    frames = vr.get_batch([0, 10])
    assert frames.shape == (2, 24, 32, 3)
    vr.close()


def test_video_loader_single_file(clip_path, tmp_path):
    root = osp.dirname(clip_path)
    vid = osp.basename(clip_path)[:-4]
    frames = video_loader(root, vid, 0.0, end_second=2.0, chunk_len=-1,
                          fps=-1, clip_length=8)
    assert frames.shape == (8, 48, 64, 3)
    assert frames.dtype == np.float32


def test_video_loader_chunked_with_stitching(tmp_path):
    """Chunked layout: vid.mp4/0.mp4 + vid.mp4/2.mp4 (chunk_len=2s @30fps);
    a clip straddling the boundary must stitch from the second chunk."""
    vdir = tmp_path / "myvid.mp4"
    vdir.mkdir()
    encode_test_video(str(vdir / "0.mp4"), 64, 48, 30, 60)
    encode_test_video(str(vdir / "2.mp4"), 64, 48, 30, 60)
    frames = video_loader(str(tmp_path), "myvid", 1.0, end_second=3.0,
                          chunk_len=2, fps=30, clip_length=16)
    assert frames.shape == (16, 48, 64, 3)
    assert np.abs(frames).sum() > 0


def test_video_loader_chunked_last_chunk_fallback(tmp_path):
    vdir = tmp_path / "solo.mp4"
    vdir.mkdir()
    encode_test_video(str(vdir / "0.mp4"), 64, 48, 30, 60)
    # request beyond the chunk end: no next chunk -> resample inside
    frames = video_loader(str(tmp_path), "solo", 1.5, end_second=4.0,
                          chunk_len=2, fps=30, clip_length=8)
    assert frames.shape == (8, 48, 64, 3)


def test_video_loader_by_frames_error_fallback(tmp_path):
    frames = video_loader_by_frames(str(tmp_path), "missing.mp4",
                                    [0, 1, 2])
    assert frames.shape == (3, 240, 320, 3)
    assert (frames == 0).all()
