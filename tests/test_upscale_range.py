"""tools/upscale.py data-range discipline (default tier, in-process).

The pm1 variants (rgb-full, gray) train on [-1,1] (donkey_folder.lua:69);
feeding them [0,1] was measured at -4 dB (PARITY.md). The eval harness has
converted since round 2 (harness.py:174) — these tests pin that the USER
tool drives the generator in its training range too, end to end through
the saved PNG, and that the full-image paths carry nc=3.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.image.io import load_image, save_image
from dcgan_sr_tpu.image.ops import box_downsample2
from dcgan_sr_tpu.models import apply_network, generator_spec
from dcgan_sr_tpu.train import init_train_state

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools import upscale  # noqa: E402

TINY = dict(ngf=4, ndf=8)
Q = 1.0 / 255.0  # PNG 8-bit quantization


def _tool(monkeypatch, argv):
    # main() reads env-override configs; pin the tiny net sizes it must build
    monkeypatch.setenv("ngf", "4")
    monkeypatch.setenv("ndf", "8")
    upscale.main(argv + ["--cpu"])


def _expected_full(variant, img_png, *, lr_input=False, key=0):
    """Reference computation: the harness's range discipline applied to the
    full-image protocol (degrade -> G -> back to [0,1]) with the tool's own
    random init (PRNGKey(0), no checkpoint)."""
    cfg = get_config(variant, env_override=False, **TINY)
    st = init_train_state(cfg, jax.random.PRNGKey(key))
    hw = load_image(img_png, nc=cfg.nc)
    hw = hw[0] if cfg.nc == 1 else hw
    pm1 = cfg.data_range == "pm1"
    net_in = hw * 2.0 - 1.0 if pm1 else hw
    x = jnp.asarray(net_in if lr_input else np.asarray(
        box_downsample2(jnp.asarray(net_in))))
    x = x[None, None] if cfg.nc == 1 else x[None]
    fake, _ = apply_network(generator_spec(cfg), st.g_params, x, st.g_state,
                            train=True)
    fake = np.asarray(fake[0, 0] if cfg.nc == 1 else fake[0])
    if pm1:
        fake = (fake + 1.0) * 0.5
    return np.clip(fake, 0.0, 1.0)


@pytest.mark.parametrize("variant", ["gray", "rgb-full"])
def test_protocol_mode_pm1_range(variant, tmp_path, monkeypatch):
    rng = np.random.RandomState(3)
    inp, outp = str(tmp_path / "in.png"), str(tmp_path / f"{variant}.png")
    save_image(inp, rng.rand(3, 24, 28).astype(np.float32))
    _tool(monkeypatch, ["--config", variant, "--mode", "full",
                        "--input", inp, "--output", outp])
    cfg_nc = get_config(variant, env_override=False).nc
    got = load_image(outp, nc=cfg_nc)
    got = got[0] if cfg_nc == 1 else got
    want = _expected_full(variant, inp)
    # PNG round-trip quantizes to 1/255; the pipelines are otherwise exact
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=Q)


def test_batch_dir_restore_odd_sizes(tmp_path, monkeypatch, capsys):
    """Directory restore-protocol mode on ODD-size images: the bilinear
    baseline must come from the padded batch (box_downsample2 requires even
    extents — the original unpadded image crashed it)."""
    rng = np.random.RandomState(8)
    ind, outd = tmp_path / "in", tmp_path / "out"
    ind.mkdir()
    save_image(str(ind / "odd.png"), rng.rand(25, 31).astype(np.float32))
    save_image(str(ind / "even.png"), rng.rand(24, 30).astype(np.float32))
    _tool(monkeypatch, ["--config", "gray-3",
                        "--input", str(ind), "--output", str(outd)])
    out = capsys.readouterr().out
    assert out.count("PSNR(bilinear)=") == 2
    assert load_image(str(outd / "odd_sr.png"), nc=1).shape == (1, 25, 31)
    assert load_image(str(outd / "even_sr.png"), nc=1).shape == (1, 24, 30)


def test_true_2x_batch_dir(tmp_path, monkeypatch):
    """--true-2x over a DIRECTORY: one program over mixed-size LR color
    images, every output 2Hx2W in [0,1]; the max-size image enters unpadded
    so it must match the direct bn_eval net-2x computation exactly."""
    from dcgan_sr_tpu.models import apply_network, generator_spec

    rng = np.random.RandomState(7)
    ind, outd = tmp_path / "in", tmp_path / "out"
    ind.mkdir()
    save_image(str(ind / "big.png"), rng.rand(3, 20, 24).astype(np.float32))
    save_image(str(ind / "small.png"), rng.rand(3, 12, 16).astype(np.float32))
    _tool(monkeypatch, ["--config", "rgb-full", "--true-2x", "--bn-eval",
                        "--input", str(ind), "--output", str(outd)])
    assert load_image(str(outd / "small_sr.png"), nc=3).shape == (3, 24, 32)
    big = load_image(str(outd / "big_sr.png"), nc=3)
    assert big.shape == (3, 40, 48)

    cfg = get_config("rgb-full", env_override=False, **TINY)
    st = init_train_state(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(load_image(str(ind / "big.png"), nc=3) * 2.0 - 1.0)[None]
    fake, _ = apply_network(generator_spec(cfg), st.g_params, x, st.g_state,
                            train=False)
    want = np.clip((np.asarray(fake[0]) + 1.0) * 0.5, 0.0, 1.0)
    np.testing.assert_allclose(big, want, atol=Q)


def test_true_2x_full_image_rgb(tmp_path, monkeypatch):
    """--true-2x on a full-image variant feeds the LR straight to the net-2x
    G (any size), in the pm1 training range, and emits 2Hx2W color."""
    rng = np.random.RandomState(5)
    inp, outp = str(tmp_path / "lr.png"), str(tmp_path / "sr.png")
    save_image(inp, rng.rand(3, 17, 23).astype(np.float32))
    _tool(monkeypatch, ["--config", "rgb-full", "--true-2x",
                        "--input", inp, "--output", outp])
    got = load_image(outp, nc=3)
    want = _expected_full("rgb-full", inp, lr_input=True)
    assert got.shape == (3, 34, 46)
    np.testing.assert_allclose(got, want, atol=Q)
