"""t7 export -> import round trip, dataset dispatch, DP on patch variants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcgan_sr_tpu.compat import export_torch_generator, import_torch_generator, load_t7
from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.data import make_dataset
from dcgan_sr_tpu.models import apply_network, generator_spec, init_network


def test_t7_export_import_roundtrip(tmp_path):
    cfg = get_config("gray-3", env_override=False, ngf=4)
    spec = generator_spec(cfg)
    params, state = init_network(jax.random.PRNGKey(0), spec)
    p = str(tmp_path / "our_net_G.t7")
    export_torch_generator(p, spec, params, state)

    # the exported file parses as an nn.Sequential with the right chain
    net = load_t7(p)
    assert net.torch_type == "nn.Sequential"
    types = [net["modules"][k].torch_type for k in sorted(net["modules"])]
    assert types[0] == "nn.SpatialUpSamplingNearest"
    assert "nn.SpatialFullConvolution" in types
    assert types[-1] == "nn.Sigmoid"

    # import into fresh params reproduces the source weights and outputs
    fresh, _ = init_network(jax.random.PRNGKey(9), spec)
    back = import_torch_generator(p, spec, fresh)
    x = jnp.asarray(np.random.RandomState(1).rand(2, 1, 32, 32), jnp.float32)
    y0, _ = apply_network(spec, params, x, state)
    y1, _ = apply_network(spec, back, x, state)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_t7_roundtrip_running_stats(tmp_path):
    """BN running stats survive export -> import; bn_eval inference matches.

    The running-stats branch enables single-image inference (torch keeps
    running_mean/running_var even in train mode — the reference's .t7
    checkpoints carry them)."""
    cfg = get_config("gray-3", env_override=False, ngf=4)
    spec = generator_spec(cfg)
    params, state = init_network(jax.random.PRNGKey(0), spec)
    # make the running stats distinctive (init is mean 0 / var 1)
    rng = np.random.RandomState(7)
    state = [({"bn": {"mean": jnp.asarray(rng.randn(*np.shape(s["bn"]["mean"]))
                                          .astype(np.float32)),
                      "var": jnp.asarray(1 + rng.rand(
                          *np.shape(s["bn"]["var"])).astype(np.float32))}}
              if s else s) for s in state]
    p = str(tmp_path / "our_net_G.t7")
    export_torch_generator(p, spec, params, state)

    fresh_p, fresh_s = init_network(jax.random.PRNGKey(9), spec)
    back_p, back_s = import_torch_generator(p, spec, fresh_p, fresh_s)
    x = jnp.asarray(np.random.RandomState(1).rand(2, 1, 32, 32), jnp.float32)
    y0, _ = apply_network(spec, params, x, state, train=False)
    y1, _ = apply_network(spec, back_p, x, back_s, train=False)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    # and it is genuinely the eval path: train-mode output differs
    y2, _ = apply_network(spec, back_p, x, back_s, train=True)
    assert float(np.abs(np.asarray(y2) - np.asarray(y1)).max()) > 1e-4


def test_dataset_dispatch():
    src = make_dataset("synthetic", fine_size=16, nc=1, seed=3)
    assert src.load_batch(0, 2).shape == (2, 1, 16, 16)
    with pytest.raises(ValueError, match="Unknown dataset"):
        make_dataset("webdataset")
    with pytest.raises(NotImplementedError):
        make_dataset("lsun")
    with pytest.raises(FileNotFoundError):
        make_dataset("folder", root="/nonexistent")


def test_dp_patch_variant():
    """DP over the 8-device mesh for the 1280-patch batch config."""
    from dcgan_sr_tpu.parallel import build_dp_train_step, create_mesh, shard_batch
    from dcgan_sr_tpu.train import build_train_step, init_train_state

    cfg = get_config("gray-patch-batch", env_override=False, ngf=4, ndf=8)
    hr = jnp.asarray(np.random.RandomState(0).rand(64, 1, 8, 8), jnp.float32)

    s1, m1 = jax.jit(build_train_step(cfg))(
        init_train_state(cfg, jax.random.PRNGKey(1)), hr)

    mesh = create_mesh(8)
    dstep = build_dp_train_step(cfg, mesh)
    s2, m2 = dstep(init_train_state(cfg, jax.random.PRNGKey(1)),
                   shard_batch(hr, mesh))
    np.testing.assert_allclose(float(m1["errG"]), float(m2["errG"]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(m1["errD"]), float(m2["errD"]),
                               rtol=1e-3, atol=1e-4)
