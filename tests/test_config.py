"""Config system: env parsing semantics, derived properties, variant table."""

import math

import pytest

from dcgan_sr_tpu.core import Config, VARIANTS, apply_env_overrides, get_config


def test_env_override_number_and_string():
    cfg = Config()
    out = apply_env_overrides(cfg, env={"lr": "0.001", "name": "run-x",
                                        "batchSize": "64"})
    assert out.lr == 0.001
    assert out.name == "run-x"
    assert out.batchSize == 64 and isinstance(out.batchSize, int)


def test_env_override_ignores_unknown_keys():
    out = apply_env_overrides(Config(), env={"HOME": "/root", "PATH": "x"})
    assert out == apply_env_overrides(Config(), env={})


def test_patch_properties():
    cfg = get_config("gray-patch-batch", env_override=False)
    assert cfg.patch_number == 64                # (64/8)^2
    assert cfg.step_batch == 20 * 64             # 1280-patch effective batch
    assert cfg.train_size == 8
    cfg2 = get_config("gray-patch-batch-overlap", env_override=False)
    assert cfg2.overlap_patch_line == 15         # (64-4)/(8-4)


def test_full_image_properties():
    cfg = get_config("gray-3", env_override=False)
    assert cfg.step_batch == 100
    assert cfg.train_size == 64


def test_variant_table_complete():
    assert set(VARIANTS) == {
        "rgb-full", "gray", "gray-2", "gray-3", "gray-patch",
        "gray-patch-batch", "gray-patch-batch-overlap"}
    # rgb-full / gray train on the full dataset (ntrain = math.huge)
    assert math.isinf(VARIANTS["rgb-full"].ntrain)
    assert math.isinf(VARIANTS["gray"].ntrain)
    # per-variant loss schemes
    assert VARIANTS["rgb-full"].fake_label == "per_image_quarter_mse"
    assert VARIANTS["gray"].fake_label == "per_image_mse"
    assert VARIANTS["gray-3"].fake_label == 0.0


def test_gray2_ignores_env(monkeypatch):
    """train-gray-2.lua has no env-override line; the config honors that."""
    monkeypatch.setenv("batchSize", "7")
    assert get_config("gray-2").batchSize == 100
    assert get_config("gray-3").batchSize == 7


def test_get_config_overrides_kwargs():
    cfg = get_config("gray-3", env_override=False, ngf=32, batchSize=10)
    assert cfg.ngf == 32 and cfg.batchSize == 10
    with pytest.raises(TypeError):
        get_config("gray-3", env_override=False, nonexistent_field=1)


def test_device_augment_implies_preprocess_even_via_env(monkeypatch):
    """device_augment => device_preprocess is enforced AFTER env overrides:
    `device_augment=1 python train.py ...` must not leave the step cropping
    raw [0,1] canvases without the fused normalize (silently out-of-domain
    for pm1 generators)."""
    cfg = get_config("rgb-full", env_override=False, device_augment=True)
    assert cfg.device_preprocess
    monkeypatch.setenv("device_augment", "1")
    cfg = get_config("rgb-full")
    assert cfg.device_augment and cfg.device_preprocess
    # env can also try to strip the preprocess from an augment config
    monkeypatch.setenv("device_preprocess", "0")
    cfg = get_config("rgb-full")
    assert cfg.device_augment and cfg.device_preprocess


def test_env_override_bool_spellings():
    """Boolean fields parse true/false spellings strictly: the reference's
    tonumber-or-string rule would store 'false' as a truthy string and
    silently ENABLE the flag (these fields are all TPU-side extensions —
    the reference opt table has no booleans)."""
    for spelling in ("0", "false", "FALSE", "no", "off"):
        out = apply_env_overrides(Config(use_pallas=True),
                                  env={"use_pallas": spelling})
        assert out.use_pallas is False, spelling
    for spelling in ("1", "true", "True", "yes", "on"):
        out = apply_env_overrides(Config(), env={"use_pallas": spelling})
        assert out.use_pallas is True, spelling
    with pytest.raises(ValueError):
        apply_env_overrides(Config(), env={"device_preprocess": "maybe"})


def test_test_file_set_start_per_variant():
    """Held-out slice base follows the variant's file-addressing batch:
    file_num = file_set * batchSize + k (overlap:247), so the patch-BATCH
    protocol's 10000 (= images 200,001+ at batch 20,
    train-gray-patch-batch.lua:489) is WRONG for every other batch size."""
    assert get_config("gray-patch-batch",
                      env_override=False).test_file_set_start == 10000
    assert get_config("gray-patch-batch-overlap",
                      env_override=False).test_file_set_start == 10000
    # gray-patch evals ONE image/step (batchSize counts its 64 patches);
    # its commented-out reference eval used file_set 2000
    # (train-gray-patch.lua:453)
    assert get_config("gray-patch",
                      env_override=False).test_file_set_start == 2000
    for v in ("gray-3", "gray", "gray-2", "rgb-full"):
        assert get_config(v, env_override=False).test_file_set_start == 2000
    # the base is keyed on the VARIANT: overriding the (freely overridable)
    # images_per_step knob must not silently move the held-out slice
    cfg = get_config("gray-patch-batch", env_override=False, images_per_step=10)
    assert cfg.test_file_set_start == 10000
