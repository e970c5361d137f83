"""dump_samples (cli.py): the end-of-run PNG dump must follow the eval
harness's channel/range conventions (evaluation/harness.py run()) for every
variant family — multi-channel rgb-full (which used to crash: a (1,1,H,W)
feed into the 3-channel G), pm1 inputs (which used to drive G out of its
training range under --device-augment), and 3-channel raw canvases for
nc==1 configs (trainHook rgb2gray). Reference dump: train.lua:306-326."""

import os
import re

import numpy as np
import jax
import pytest

from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.train import init_train_state
from dcgan_sr_tpu.cli import dump_samples


def _psnr_lines(capsys):
    out = capsys.readouterr().out
    return {m.group(1): float(m.group(2))
            for m in re.finditer(r"PSNR btwn real & (\w+): ([\d.]+)", out)}


def test_rgb_full_three_channel_dump(tmp_path, capsys):
    # the multi-channel path: (3, H, W) sample through the 3-channel G
    cfg = get_config("rgb-full", env_override=False, ngf=4, ndf=8)
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    sample = np.random.RandomState(0).rand(3, 64, 64).astype(np.float32)
    dump_samples(cfg, state, str(tmp_path), sample)
    for f in ("real_none_sample.png", "real_reduced_sample.png",
              "real_bilinear_sample.png", "fake_none_sample.png"):
        assert os.path.isfile(tmp_path / f), f
    scores = _psnr_lines(capsys)
    assert np.isfinite(scores["bilinear"]) and np.isfinite(scores["fake"])


def test_pm1_scoring_is_on_01_scale(tmp_path, capsys):
    # pm1 config (gray): G must be driven in [-1,1] but the printed PSNR
    # must be scored on the [0,1] scale (harness convention) — pin it
    # against an independently-composed bilinear control
    from dcgan_sr_tpu.image.ops import box_downsample2, resize_bilinear
    from dcgan_sr_tpu.metrics.psnr_ssim import cal_psnr

    cfg = get_config("gray", env_override=False, ngf=4, ndf=8)
    assert cfg.data_range == "pm1"
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    base = rng.rand(8, 8).astype(np.float32)
    sample = np.asarray(resize_bilinear(base, 64, 64))  # smooth, [0,1]
    dump_samples(cfg, state, str(tmp_path), sample)

    net_in = sample * 2.0 - 1.0
    bil = (resize_bilinear(box_downsample2(net_in), 64, 64) + 1.0) * 0.5
    want = float(cal_psnr(sample, np.asarray(bil)))
    got = _psnr_lines(capsys)["bilinear"]
    assert got == pytest.approx(want, abs=1e-3), (got, want)
    # scored on the pm1 scale this would be exactly 20*log10(2) higher
    assert abs(got - (want + 20 * np.log10(2))) > 1.0


def test_nc1_config_grays_a_raw_rgb_canvas(tmp_path, capsys):
    # the --device-augment sample path hands dump_samples a raw [0,1]
    # 3-channel crop; an nc==1 config must rgb2gray it like the trainHook
    # AND save the pre-conversion color image (testSample's
    # real_none_color_sample.png, train-gray.lua:326)
    cfg = get_config("gray", env_override=False, ngf=4, ndf=8)
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    sample = np.random.RandomState(2).rand(3, 64, 64).astype(np.float32)
    dump_samples(cfg, state, str(tmp_path), sample)
    assert os.path.isfile(tmp_path / "real_none_color_sample.png")
    scores = _psnr_lines(capsys)
    assert np.isfinite(scores["bilinear"]) and np.isfinite(scores["fake"])


def test_stats_lines_for_every_dumped_png(tmp_path, capsys):
    # the reference prints max/min (+sum/std) for EVERY PNG it saves
    # (train-gray.lua:334-380); each dumped file must have a matching
    # "<stem>-max: ..." line
    cfg = get_config("gray", env_override=False, ngf=4, ndf=8)
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    sample = np.random.RandomState(4).rand(3, 64, 64).astype(np.float32)
    dump_samples(cfg, state, str(tmp_path), sample)
    out = capsys.readouterr().out
    pngs = sorted(f[:-4] for f in os.listdir(tmp_path) if f.endswith(".png"))
    assert pngs, "no PNGs dumped"
    for stem in pngs:
        assert re.search(rf"{stem}-max: [-\d.]+\s+{stem}-min: [-\d.]+", out), stem
        assert re.search(rf"{stem}-sum: [-\d.]+\s+{stem}-std: [-\d.]+", out), stem


def test_patch_variant_dump_unchanged(tmp_path, capsys):
    # regression guard for the established gray-patch-batch ('01') flow,
    # incl. the polarity-rescue branch staying runnable
    cfg = get_config("gray-patch-batch", env_override=False, ngf=4, ndf=8)
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    sample = np.random.RandomState(3).rand(64, 64).astype(np.float32)
    dump_samples(cfg, state, str(tmp_path), sample)
    assert os.path.isfile(tmp_path / "fake_none_sample.png")
    assert np.isfinite(_psnr_lines(capsys)["fake"])
