"""CLI smoke tests: each app runs end-to-end on tiny synthetic data in-process."""
import json
import sys

import numpy as np
import pytest

from depth_estimation_tpu.data.synthetic import make_stereo_pair
from depth_estimation_tpu.utils.io import read_pfm, write_pfm


@pytest.fixture()
def stereo_files(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(1)
    left, right, disp = make_stereo_pair(rng, h=48, w=64, max_disp=6)
    lp, rp, gp = tmp_path / "l.png", tmp_path / "r.png", tmp_path / "gt.pfm"
    Image.fromarray((left * 255).astype(np.uint8)).save(lp)
    Image.fromarray((right * 255).astype(np.uint8)).save(rp)
    write_pfm(gp, disp.astype(np.float32))
    return lp, rp, gp


def test_infer_cli(stereo_files, tmp_path, capsys):
    from depth_estimation_tpu.apps.infer import main

    lp, rp, gp = stereo_files
    out = tmp_path / "disp.pfm"
    rc = main([
        "--left", str(lp), "--right", str(rp), "--gt", str(gp),
        "--out", str(out), "--labels", "8", "--iters", "2",
    ])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["shape"] == [48, 64]
    assert "epe" in result and np.isfinite(result["epe"])
    disp = read_pfm(out)
    assert disp.shape == (48, 64)


def test_upsample_cli(stereo_files, tmp_path, capsys):
    from depth_estimation_tpu.apps.upsample import main

    lp, rp, gp = stereo_files
    gt = read_pfm(gp)
    low = gt[::4, ::4] / 4.0
    lowp = tmp_path / "low.pfm"
    write_pfm(lowp, low.astype(np.float32))
    out = tmp_path / "up.pfm"
    rc = main(["--disp", str(lowp), "--image", str(lp), "--out", str(out), "--gt", str(gp)])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["shape"] == [48, 64]
    assert np.isfinite(result["masked_l1"])


def test_segment_cli(stereo_files, tmp_path, capsys):
    from depth_estimation_tpu.apps.segment import main

    lp, _, _ = stereo_files
    out = tmp_path / "seg.png"
    rc = main(["--image", str(lp), "--out", str(out), "--segments", "3", "--eigs", "4"])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["segments_found"] >= 2
    assert out.exists()


def test_train_crf_cli(stereo_files, tmp_path, capsys):
    from depth_estimation_tpu.apps.train_crf import main

    lp, rp, gp = stereo_files
    out = tmp_path / "params.npz"
    rc = main([
        "--left", str(lp), "--right", str(rp), "--gt", str(gp),
        "--steps", "5", "--labels", "8", "--iters", "2", "--out", str(out),
    ])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(result["mse_after"])
    assert out.exists()
