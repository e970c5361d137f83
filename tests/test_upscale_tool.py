"""tools/upscale.py end-to-end: npz and .t7 checkpoint paths (subprocess)."""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # subprocess tier: run with --runslow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    import jax
    from dcgan_sr_tpu.compat import save_t7
    from dcgan_sr_tpu.core import get_config
    from dcgan_sr_tpu.image.io import save_image
    from dcgan_sr_tpu.train import init_train_state
    from dcgan_sr_tpu.train.checkpoint import save_checkpoint

    d = tmp_path_factory.mktemp("upscale")
    save_image(str(d / "in.png"),
               np.random.RandomState(0).rand(3, 70, 70).astype(np.float32))
    cfg = get_config("gray-3", env_override=False, ngf=4, ndf=8)
    st = init_train_state(cfg, jax.random.PRNGKey(0))
    save_checkpoint(str(d), cfg.name, 1, st)
    cfg_e = get_config("gray-3", env_override=False, ngf=4, ndf=8, g_ema=0.9)
    st_e = init_train_state(cfg_e, jax.random.PRNGKey(0))
    save_checkpoint(str(d / "ema"), cfg.name, 1, st_e)

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_t7 import _fake_reference_netG
    cfg_ov = get_config("gray-patch-batch-overlap", env_override=False, ngf=4)
    net, _ = _fake_reference_netG(cfg_ov)
    save_t7(str(d / "ref_net_G.t7"), net)
    return d


def _run(args):
    env = dict(os.environ, ngf="4", ndf="8")  # cache dir inherited (conftest)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "upscale.py"), "--cpu"]
        + args, capture_output=True, text=True, timeout=420, env=env, cwd=REPO)


def test_upscale_npz(assets):
    out_png = str(assets / "out.png")
    r = _run(["--config", "gray-3",
              "--ckpt", str(assets / "dcgan-sr-tpu_1_net_G.npz"),
              "--input", str(assets / "in.png"), "--output", out_png])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "loaded checkpoint" in r.stdout and "PSNR(G)=" in r.stdout
    assert os.path.isfile(out_png)


def test_upscale_t7_overlap(assets):
    out_png = str(assets / "out2.png")
    r = _run(["--config", "gray-patch-batch-overlap", "--mode", "overlap",
              "--t7", str(assets / "ref_net_G.t7"),
              "--input", str(assets / "in.png"), "--output", out_png])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "loaded Torch checkpoint" in r.stdout
    assert "mode=overlap" in r.stdout
    assert os.path.isfile(out_png)


def test_upscale_batch_dir_sharded(assets):
    """Directory batch mode: mixed-size images through ONE sharded overlap-SR
    program (8-device virtual mesh), outputs cropped back to native sizes."""
    from dcgan_sr_tpu.image.io import load_image, save_image
    ind = assets / "batch_in"
    ind.mkdir(exist_ok=True)
    rng = np.random.RandomState(5)
    save_image(str(ind / "a.png"), rng.rand(40, 40).astype(np.float32))
    save_image(str(ind / "b.png"), rng.rand(28, 36).astype(np.float32))
    save_image(str(ind / "c.png"), rng.rand(40, 24).astype(np.float32))
    outd = str(assets / "batch_out")
    r = _run(["--config", "gray-patch-batch-overlap", "--dp",
              "--t7", str(assets / "ref_net_G.t7"),
              "--input", str(ind), "--output", outd])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "sharded over 8 devices" in r.stdout, r.stdout
    assert load_image(os.path.join(outd, "a_sr.png"), nc=1).shape == (1, 40, 40)
    assert load_image(os.path.join(outd, "b_sr.png"), nc=1).shape == (1, 28, 36)
    assert load_image(os.path.join(outd, "c_sr.png"), nc=1).shape == (1, 40, 24)


def test_upscale_batch_dir_true_2x_tiled(assets):
    """Directory batch mode with --true-2x on a patch config: LR inputs are
    padded to lr-legal extents, tiled at half geometry, and every output is
    2Hx2W (no PSNR lines — the input IS the LR, there is no ground truth)."""
    from dcgan_sr_tpu.image.io import load_image, save_image
    ind = assets / "batch_2x_in"
    ind.mkdir(exist_ok=True)
    rng = np.random.RandomState(9)
    save_image(str(ind / "a.png"), rng.rand(24, 24).astype(np.float32))
    save_image(str(ind / "b.png"), rng.rand(18, 22).astype(np.float32))
    outd = str(assets / "batch_2x_out")
    r = _run(["--config", "gray-patch-batch-overlap", "--dp", "--true-2x",
              "--t7", str(assets / "ref_net_G.t7"),
              "--input", str(ind), "--output", outd])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "sharded over 8 devices" in r.stdout, r.stdout
    assert "PSNR" not in r.stdout
    assert "a.png: 24x24 -> 48x48" in r.stdout
    assert load_image(os.path.join(outd, "a_sr.png"), nc=1).shape == (1, 48, 48)
    assert load_image(os.path.join(outd, "b_sr.png"), nc=1).shape == (1, 36, 44)


def test_upscale_batch_dir_full_image_rgb(assets):
    """Directory batch mode on a FULL-IMAGE pm1 config (rgb-full): one
    sharded net-2x program over mixed-size color images, pm1 range handled
    by the tool, outputs cropped back to native sizes."""
    from dcgan_sr_tpu.image.io import load_image, save_image
    ind = assets / "batch_rgb_in"
    ind.mkdir(exist_ok=True)
    rng = np.random.RandomState(6)
    save_image(str(ind / "a.png"), rng.rand(3, 30, 34).astype(np.float32))
    save_image(str(ind / "b.png"), rng.rand(3, 22, 26).astype(np.float32))
    outd = str(assets / "batch_rgb_out")
    r = _run(["--config", "rgb-full", "--dp",
              "--input", str(ind), "--output", outd])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "sharded over 8 devices" in r.stdout, r.stdout
    assert "PSNR(G)=" in r.stdout
    assert load_image(os.path.join(outd, "a_sr.png"), nc=3).shape == (3, 30, 34)
    assert load_image(os.path.join(outd, "b_sr.png"), nc=3).shape == (3, 22, 26)


def test_upscale_native_size_nonsquare(assets):
    """Arbitrary-size inference: a 90x70 image SRs at native size through the
    overlap path (pad-and-crop), generalizing overlap:387-399's fixed 64."""
    from dcgan_sr_tpu.image.io import save_image
    inp = str(assets / "nonsq.png")
    save_image(inp, np.random.RandomState(3).rand(90, 70).astype(np.float32))
    out_png = str(assets / "out_nonsq.png")
    r = _run(["--config", "gray-patch-batch-overlap", "--mode", "overlap",
              "--t7", str(assets / "ref_net_G.t7"),
              "--input", inp, "--output", out_png])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "padded 90x70 -> 92x72" in r.stdout
    assert "size=90x70" in r.stdout
    from dcgan_sr_tpu.image.io import load_image
    assert load_image(out_png, nc=1).shape == (1, 90, 70)


def test_upscale_ema_branch(assets):
    out_png = str(assets / "out_ema.png")
    ck = str(assets / "ema" / "dcgan-sr-tpu_1_net_G.npz")
    r = _run(["--config", "gray-3", "--ckpt", ck, "--ema",
              "--input", str(assets / "in.png"), "--output", out_png])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.isfile(out_png)
    # a checkpoint without the ema branch is rejected with a clear error
    r2 = _run(["--config", "gray-3",
               "--ckpt", str(assets / "dcgan-sr-tpu_1_net_G.npz"), "--ema",
               "--input", str(assets / "in.png"), "--output", out_png])
    assert r2.returncode != 0 and "no 'ema' branch" in (r2.stderr + r2.stdout)
