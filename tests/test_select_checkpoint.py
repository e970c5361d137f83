"""tools/select_checkpoint.py ranking robustness (default tier, in-process).

Round-3 lesson: killing a training run mid-epoch truncated the in-flight
npz and the ranker crashed on the torn file, losing the whole selection
pass. Saves are atomic now (checkpoint.py save_checkpoint), but legacy
directories can still hold torn files — the ranker must skip them loudly
and keep scoring, never abort."""

import os
import sys

import numpy as np
import jax
import pytest

from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.train import init_train_state
from dcgan_sr_tpu.train.checkpoint import checkpoint_path, save_checkpoint

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools import select_checkpoint  # noqa: E402

pytestmark = pytest.mark.slow  # in-process but evals 200 images on CPU


def test_ranker_skips_torn_npz(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("ngf", "4")
    monkeypatch.setenv("ndf", "8")
    cfg = get_config("gray-3")
    st = init_train_state(cfg, jax.random.PRNGKey(7))
    save_checkpoint(str(tmp_path), cfg.name, 1, st)
    # a legacy torn save: epoch 2's G npz is a truncated zip
    with open(checkpoint_path(str(tmp_path), cfg.name, 2, "G"), "wb") as f:
        f.write(b"PK\x03\x04 truncated mid-write")
    save_checkpoint(str(tmp_path), cfg.name, 2, st)  # net_D intact
    os_path_2 = checkpoint_path(str(tmp_path), cfg.name, 2, "G") + ".tmp"
    assert not os.path.exists(os_path_2)
    with open(checkpoint_path(str(tmp_path), cfg.name, 2, "G"), "wb") as f:
        f.write(b"PK\x03\x04 truncated mid-write")  # re-tear after save

    monkeypatch.setattr(sys, "argv", [
        "select_checkpoint.py", "--dir", str(tmp_path), "--config", "gray-3",
        "--cpu", "--select-sets", "1", "--epochs", "1:3"])
    select_checkpoint.main()
    out = capsys.readouterr().out
    assert "epoch 2: SKIPPED unreadable checkpoint" in out
    assert "BEST by train-slice PSNR: epoch 1" in out
