"""utils/: timers, tensor stats, metrics logger, image-IO convention probes."""

import json
import subprocess
import sys
import os
import time

import numpy as np

from dcgan_sr_tpu.utils import MetricsLogger, Timer, tensor_stats
from dcgan_sr_tpu.image.io import load_image, save_display

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_timer_reset_resume_stop():
    t = Timer()
    time.sleep(0.02)
    t.stop()
    a = t.time()["real"]
    assert 0.01 < a < 1.0
    time.sleep(0.02)
    assert abs(t.time()["real"] - a) < 1e-3  # stopped: no accumulation
    t.resume()
    time.sleep(0.02)
    assert t.time()["real"] > a + 0.01
    t.reset()
    assert t.time()["real"] < 0.01


def test_tensor_stats_unbiased_std():
    x = np.array([1.0, 2.0, 3.0, 4.0])
    s = tensor_stats(x)
    assert s["max"] == 4 and s["min"] == 1 and s["sum"] == 10
    np.testing.assert_allclose(s["std"], np.std(x, ddof=1))


def test_metrics_logger_jsonl_csv(tmp_path):
    jp, cp = str(tmp_path / "m.jsonl"), str(tmp_path / "m.csv")
    lines = []
    lg = MetricsLogger(jsonl_path=jp, csv_path=cp, log_fn=lines.append)
    lg.log_step(1, 0, 10, 0.1, 0.01, {"errG": 0.5, "errD": 1.25})
    lg.log_step(1, 1, 10, 0.1, 0.01, {"errG": 0.4, "errD": 1.0})
    lg.log_epoch(1, 1, 0.3)
    lg.close()
    # reference log-line shape
    assert lines[0].startswith("Epoch: [1][       0 /       10]")
    assert "Err_G: 0.5" in lines[0] and "Err_D: 1.2500" in lines[0]
    recs = [json.loads(l) for l in open(jp)]
    assert len(recs) == 2 and recs[1]["errG"] == 0.4
    rows = open(cp).read().strip().splitlines()
    assert len(rows) == 3  # header + 2


def test_display_save_constant_is_black(tmp_path):
    """test_tensor_to_image.lua convention: constant tensors save as black."""
    for val in (0.0, 0.5, 1.0, -1.0, -0.5):
        p = str(tmp_path / f"c{val}.png")
        save_display(p, np.full((8, 8), val, np.float32))
        byte = load_image(p, nc=1, dtype="byte")
        assert int(byte.max()) == 0


def test_decode_convention(tmp_path):
    """test_image_to_tensor.lua convention: byte decode is CHW uint8 0-255."""
    from dcgan_sr_tpu.image.io import save_image
    p = str(tmp_path / "w.png")
    save_image(p, np.ones((3, 4, 4), np.float32))
    byte = load_image(p, nc=3, dtype="byte")
    assert byte.shape == (3, 4, 4) and byte.dtype == np.uint8
    assert byte.min() == byte.max() == 255
    flt = load_image(p, nc=3, dtype="float")
    assert flt.dtype == np.float32 and float(flt.max()) == 1.0


def test_probe_script_runs():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "probe_image_io.py"),
         "/tmp/probe_test"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "constant input -> black" in out.stdout
    assert "image_333333" in out.stdout
