"""CLI end-to-end smoke tests (subprocess, CPU-pinned, tiny models)."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # subprocess tier: run with --runslow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, env_extra=None, timeout=420, synthetic=True):
    env = dict(os.environ)
    # JAX_COMPILATION_CACHE_DIR is inherited from conftest (per-machine CPU dir)
    env.update({"ngf": "4", "ndf": "8", "batchSize": "4", "ntrain": "8"})
    env.update(env_extra or {})
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"), "--cpu"]
        + (["--synthetic"] if synthetic else []) + args,
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env)


@pytest.mark.parametrize("variant", ["gray-3", "gray-patch-batch"])
def test_cli_trains(variant, tmp_path):
    out = _run(["--config", variant, "--steps", "2", "--epochs", "1",
                "--metrics-jsonl", str(tmp_path / "m.jsonl")])
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Epoch: [1][" in out.stdout
    assert "End of epoch 1 / 1" in out.stdout
    recs = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert len(recs) == 2 and all("errG" in r for r in recs)


def test_cli_checkpoint_resume(tmp_path):
    ck = str(tmp_path / "ck")
    out1 = _run(["--config", "gray-3", "--steps", "1", "--epochs", "1",
                 "--checkpoint-dir", ck])
    assert out1.returncode == 0, out1.stderr[-2000:]
    out2 = _run(["--config", "gray-3", "--steps", "1", "--epochs", "2",
                 "--checkpoint-dir", ck, "--resume"])
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert "resumed from epoch 1" in out2.stdout
    # Continued numbering: the resumed run trains ONLY epoch 2 and must not
    # renumber from 1 (which would clobber the first run's checkpoints).
    assert "End of epoch 2 / 2" in out2.stdout
    assert "End of epoch 1 / 2" not in out2.stdout
    names = os.listdir(ck)
    assert any("_1_net_G" in n for n in names)
    assert any("_2_net_G" in n for n in names)


def test_cli_gray_folder_variant(tmp_path):
    """The rgb2gray folder path (train-gray.lua shape) through the CLI."""
    import numpy as np
    from dcgan_sr_tpu.image.io import save_image
    rng = np.random.RandomState(0)
    root = tmp_path / "celeba"
    (root / "faces").mkdir(parents=True)
    for i in range(6):
        save_image(str(root / "faces" / f"{i}.png"),
                   rng.rand(3, 120, 100).astype(np.float32))
    out = _run(["--config", "gray", "--steps", "1", "--epochs", "1",
                "--data-root", str(root)],
               env_extra={"nThreads": "2"}, synthetic=False)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Epoch: [1][" in out.stdout


def test_cli_pallas_preprocess(tmp_path):
    """--use-pallas routes the degrade stage through the Pallas kernel
    (interpret mode on the CPU backend)."""
    out = _run(["--config", "gray-3", "--steps", "1", "--epochs", "1",
                "--use-pallas"])
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Epoch: [1][" in out.stdout


def test_cli_eval_and_samples(tmp_path):
    sdir = str(tmp_path / "samples")
    out = _run(["--config", "gray-3", "--steps", "1", "--epochs", "1",
                "--eval", "--eval-sets", "1", "--samples-dir", sdir])
    assert out.returncode == 0, out.stderr[-2000:]
    assert "[Train-set] PSNR btwn real_none & real_bilinear" in out.stdout
    assert "[Test-set] SSIM btwn real_none & fake_none" in out.stdout
    assert os.path.isfile(os.path.join(sdir, "fake_none_sample.png"))
    assert os.path.isfile(os.path.join(sdir, "real_bilinear_sample.png"))
    assert "real_none_sample-max" in out.stdout  # tensor-stats telemetry


def test_cli_patch_eval_protocol(tmp_path):
    """--eval on a patch variant drives the per-tile eval + reassembly path
    (file_set 10000+ test slice, train-gray-patch-batch.lua:489)."""
    out = _run(["--config", "gray-patch-batch", "--steps", "1", "--epochs",
                "1", "--eval", "--eval-sets", "1"])
    assert out.returncode == 0, out.stderr[-2000:]
    assert "[Train-set] PSNR btwn real_none & real_bilinear" in out.stdout
    assert "[Test-set] PSNR btwn real_none & fake_none" in out.stdout


def test_cli_scan_runner(tmp_path):
    """--scan K: chunked lax.scan training through the CLI (tail step incl.)."""
    out = _run(["--config", "gray-patch-batch", "--steps", "5", "--epochs", "1",
                "--scan", "2",
                "--metrics-jsonl", str(tmp_path / "m.jsonl")])
    assert out.returncode == 0, out.stderr[-2000:]
    assert "End of epoch 1 / 1" in out.stdout
    recs = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    # chunk ends at steps 2, 4 and the tail step 5 -> 3 metric records
    assert len(recs) == 3 and all("errG" in r for r in recs)


def test_cli_overlap_eval_protocol(tmp_path):
    """--eval on the overlap config runs the tiled pipeline and prints the
    bilinear / naive / seam comparison (overlap:423-424,453-454,703-704)."""
    out = _run(["--config", "gray-patch-batch-overlap", "--textured",
                "--steps", "1", "--epochs", "1", "--eval", "--eval-sets", "1"])
    assert out.returncode == 0, out.stderr[-2000:]
    for tag in ("Train-set", "Test-set"):
        assert f"[{tag}] PSNR btwn real_none & real_bilinear" in out.stdout
        assert f"[{tag}] PSNR btwn real_none & fake_none:" in out.stdout
        assert f"[{tag}] PSNR btwn real_none & fake_none_overlap" in out.stdout
        assert f"[{tag}] SSIM btwn real_none & fake_none_overlap" in out.stdout


def test_cli_device_augment_folder(tmp_path):
    """--device-augment feeds raw loadSize canvases; crop/hflip + preprocess
    run inside the train step (north-star on-chip donkey, L3 row)."""
    import numpy as np
    from dcgan_sr_tpu.image.io import save_image
    rng = np.random.RandomState(1)
    root = tmp_path / "celeba"
    (root / "faces").mkdir(parents=True)
    for i in range(6):
        save_image(str(root / "faces" / f"{i}.png"),
                   rng.rand(3, 120, 100).astype(np.float32))
    out = _run(["--config", "gray", "--steps", "2", "--epochs", "1",
                "--device-augment", "--data-root", str(root)],
               env_extra={"nThreads": "2"}, synthetic=False)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Epoch: [1][" in out.stdout
    assert "disabled for this run" not in out.stdout


def test_cli_feed_bf16_scan(tmp_path):
    """--feed-bf16 ships the batches as bfloat16 through the scan runner;
    training must complete with finite metrics (math is pinned exactly by
    test_train_step.test_feed_bf16_equals_prequantized_f32)."""
    out = _run(["--config", "gray-3", "--steps", "4", "--epochs", "1",
                "--scan", "2", "--feed-bf16",
                "--metrics-jsonl", str(tmp_path / "m.jsonl")])
    assert out.returncode == 0, out.stderr[-2000:]
    assert "End of epoch 1 / 1" in out.stdout
    recs = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    import numpy as np
    assert recs and all(np.isfinite(r["errG"]) for r in recs)


def test_cli_stage_ahead_scan(tmp_path):
    """--stage-ahead (feed double-buffering) through the scan runner; math
    is pinned by test_multi_step.test_train_epochs_stage_ahead_equals_plain."""
    out = _run(["--config", "gray-3", "--steps", "5", "--epochs", "1",
                "--scan", "2", "--stage-ahead", "--feed-bf16",
                "--metrics-jsonl", str(tmp_path / "m.jsonl")])
    assert out.returncode == 0, out.stderr[-2000:]
    assert "End of epoch 1 / 1" in out.stdout
    recs = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    import numpy as np
    assert recs and all(np.isfinite(r["errG"]) for r in recs)
