"""Utility tests: IO round-trips, visualization rasterizer, memory report,
profiling helpers, config of native binding."""
import numpy as np
import pytest

from depth_estimation_tpu.utils.io import read_pfm, read_pgm, write_pfm
from depth_estimation_tpu.utils.memory import format_bytes, live_array_report
from depth_estimation_tpu.utils.profiling import StageTimer, roofline
from depth_estimation_tpu.utils.visualize import (
    colorize_labels,
    disparity_panel,
    draw_detections,
)


def test_pfm_roundtrip_gray_and_rgb(tmp_path, rng):
    gray = rng.rand(12, 17).astype(np.float32)
    p = tmp_path / "g.pfm"
    write_pfm(p, gray)
    np.testing.assert_allclose(read_pfm(p), gray, rtol=1e-7)

    rgb = rng.rand(9, 7, 3).astype(np.float32)
    p2 = tmp_path / "c.pfm"
    write_pfm(p2, rgb)
    np.testing.assert_allclose(read_pfm(p2), rgb, rtol=1e-7)


def test_pgm_reader_8_and_16bit(tmp_path):
    p8 = tmp_path / "a.pgm"
    data8 = np.arange(12, dtype=np.uint8).reshape(3, 4)
    with open(p8, "wb") as f:
        f.write(b"P5\n4 3\n255\n" + data8.tobytes())
    np.testing.assert_array_equal(read_pgm(p8), data8)

    p16 = tmp_path / "b.pgm"
    data16 = (np.arange(12, dtype=np.uint16) * 100).reshape(3, 4)
    with open(p16, "wb") as f:
        f.write(b"P5\n4 3\n65535\n" + data16.astype(">u2").tobytes())
    np.testing.assert_array_equal(read_pgm(p16), data16)


def test_pgm_comments(tmp_path):
    p = tmp_path / "c.pgm"
    with open(p, "wb") as f:
        f.write(b"P5\n# a comment\n2 2\n255\n" + bytes([1, 2, 3, 4]))
    np.testing.assert_array_equal(read_pgm(p), [[1, 2], [3, 4]])


def test_draw_detections_and_panel(rng):
    img = rng.rand(32, 40, 3)
    boxes = np.asarray([[5, 5, 20, 20], [25, 10, 38, 30]], float)
    masks = np.ones((2, 8, 8))
    out = draw_detections(img, boxes, classes=[1, 2], masks=masks, valid=[True, True])
    assert out.shape == (32, 40, 3) and out.dtype == np.uint8
    panel = disparity_panel(img, rng.rand(32, 40), rng.rand(32, 40))
    assert panel.shape == (32, 120, 3)
    lab = colorize_labels(np.zeros((4, 4), int))
    assert lab.shape == (4, 4, 3)


def test_memory_report_runs():
    import jax

    jax.numpy.ones((16,)).block_until_ready()
    out = live_array_report(print_fn=None)
    assert isinstance(out, dict)
    assert format_bytes(2048).endswith("KiB")


def test_stage_timer_and_roofline():
    import jax.numpy as jnp

    t = StageTimer()
    t.time_fn("add", lambda x: x + 1, jnp.ones((8,)), reps=2)
    assert "add" in t.spans and t.spans["add"] >= 0
    r = roofline(1e-3, bytes_moved=819e6)
    assert abs(r["hbm_fraction"] - 1.0) < 1e-6


def test_paste_roi_masks_and_color_splash():
    from depth_estimation_tpu.utils.visualize import color_splash, paste_roi_masks

    img = np.random.RandomState(0).rand(16, 20, 3).astype(np.float32)
    masks = np.ones((2, 4, 4), np.float32)
    boxes = np.array([[2, 3, 10, 9], [0, 0, 0, 0]], np.float32)
    full = paste_roi_masks(boxes, masks, 16, 20, valid=[True, False])
    assert full.shape == (2, 16, 20)
    assert full[0, 3:9, 2:10].all() and full[0].sum() == 6 * 8
    assert not full[1].any()

    out = color_splash(img, full)
    assert out.dtype == np.uint8
    inside = (img[3:9, 2:10] * 255).astype(np.uint8)
    np.testing.assert_array_equal(out[3:9, 2:10], inside)
    # outside pixels are gray (all channels equal)
    assert (out[0, 0, 0] == out[0, 0, 1]) and (out[0, 0, 1] == out[0, 0, 2])
