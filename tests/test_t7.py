"""Torch7 serialization round-trip + reference-checkpoint import mapping."""

import numpy as np
import jax
import pytest

from dcgan_sr_tpu.compat import T7Object, load_t7, save_t7, import_torch_generator
from dcgan_sr_tpu.compat.torch_import import import_torch_sequential
from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.models import apply_network, generator_spec, init_network


def test_t7_scalar_roundtrip(tmp_path):
    p = str(tmp_path / "x.t7")
    for val in [None, True, False, 3, 2.5, "hello", {"a": 1, 2: "b"}]:
        save_t7(p, val)
        assert load_t7(p) == val


def test_t7_tensor_roundtrip(tmp_path):
    p = str(tmp_path / "t.t7")
    for arr in [np.random.RandomState(0).rand(3, 4, 5).astype(np.float32),
                np.arange(10, dtype=np.int64),
                np.arange(6, dtype=np.uint8).reshape(2, 3)]:
        save_t7(p, arr)
        back = load_t7(p)
        np.testing.assert_array_equal(back, arr)
        assert back.dtype == arr.dtype


def test_t7_nested_and_shared(tmp_path):
    p = str(tmp_path / "n.t7")
    shared = {"w": np.ones(3, np.float32)}
    obj = {"a": shared, "b": shared, "name": "net"}
    save_t7(p, obj)
    back = load_t7(p)
    # shared table deduped through the heap index
    assert back["a"] is back["b"]
    np.testing.assert_array_equal(back["a"]["w"], shared["w"])


def test_t7_shared_tensor_writes_one_heap_object(tmp_path):
    """A tensor referenced twice (shared weights) must back-reference ONE
    heap entry, like tables do — real Torch preserves the shared identity."""
    p = str(tmp_path / "s.t7")
    w = np.random.RandomState(1).rand(4, 3).astype(np.float32)
    save_t7(p, {"m1": {"weight": w}, "m2": {"weight": w}})
    back = load_t7(p)
    assert back["m1"]["weight"] is back["m2"]["weight"]
    np.testing.assert_array_equal(back["m1"]["weight"], w)
    # the back-reference also shrinks the file: two copies would carry the
    # raw bytes twice
    import os
    single = str(tmp_path / "one.t7")
    save_t7(single, {"m1": {"weight": w}, "m2": {"weight": w.copy()}})
    assert os.path.getsize(p) < os.path.getsize(single)


def test_t7_torch_object_roundtrip(tmp_path):
    p = str(tmp_path / "o.t7")
    m = T7Object("nn.SpatialConvolution",
                 {"weight": np.random.RandomState(1).rand(4, 2, 3, 3)
                  .astype(np.float32), "nInputPlane": 2, "nOutputPlane": 4})
    save_t7(p, m)
    back = load_t7(p)
    assert isinstance(back, T7Object)
    assert back.torch_type == "nn.SpatialConvolution"
    np.testing.assert_array_equal(back["weight"], m["weight"])


def _fake_reference_netG(cfg, seed=0):
    """Serialize an nn.Sequential shaped like train-gray-3.lua:52-73."""
    rng = np.random.RandomState(seed)
    spec = generator_spec(cfg)
    mods, weights = {}, []
    idx = 1

    def add(m):
        nonlocal idx
        mods[idx] = m
        idx += 1

    for layer in spec:
        if layer["kind"] == "upsample":
            add(T7Object("nn.SpatialUpSamplingNearest", {"scale_factor": 2}))
            continue
        name = ("nn.SpatialConvolution" if layer["kind"] == "conv"
                else "nn.SpatialFullConvolution")
        if layer["kind"] == "conv":
            shape = (layer["cout"], layer["cin"], layer["k"], layer["k"])
        else:
            shape = (layer["cin"], layer["cout"], layer["k"], layer["k"])
        w = (0.02 * rng.randn(*shape)).astype(np.float32)
        weights.append(w)
        add(T7Object(name, {"weight": w}))
        if layer.get("bn"):
            scale = (1 + 0.02 * rng.randn(layer["cout"])).astype(np.float32)
            bias = np.zeros(layer["cout"], np.float32)
            weights.append((scale, bias))
            add(T7Object("nn.SpatialBatchNormalization",
                         {"weight": scale, "bias": bias,
                          "running_mean": np.zeros(layer["cout"], np.float32),
                          "running_var": np.ones(layer["cout"], np.float32)}))
        if layer.get("act") == "relu":
            add(T7Object("nn.ReLU", {"inplace": True}))
        elif layer.get("act") == "sigmoid":
            add(T7Object("nn.Sigmoid", {}))
    return T7Object("nn.Sequential", {"modules": mods}), weights


def test_import_reference_generator_checkpoint(tmp_path):
    cfg = get_config("gray-3", env_override=False, ngf=4)
    net, _ = _fake_reference_netG(cfg)
    p = str(tmp_path / "ref_net_G.t7")
    save_t7(p, net)

    spec = generator_spec(cfg)
    params, state = init_network(jax.random.PRNGKey(0), spec)
    imported = import_torch_generator(p, spec, params)

    # imported weights differ from our init and match the t7 contents
    loaded = load_t7(p)
    mods = [loaded["modules"][k] for k in sorted(loaded["modules"])]
    convs = [m for m in mods if "Convolution" in m.torch_type]
    li = [i for i, l in enumerate(spec) if l["kind"] in ("conv", "convT")]
    for i, m in zip(li, convs):
        np.testing.assert_array_equal(np.asarray(imported[i]["w"]), m["weight"])

    # imported generator runs
    x = np.random.RandomState(2).rand(2, 1, 32, 32).astype(np.float32)
    y, _ = apply_network(spec, imported, x, state)
    assert y.shape == (2, 1, 64, 64)


def test_import_rejects_wrong_topology(tmp_path):
    cfg = get_config("gray-3", env_override=False, ngf=4)
    net, _ = _fake_reference_netG(cfg)
    p = str(tmp_path / "g.t7")
    save_t7(p, net)
    cfg2 = get_config("gray-3", env_override=False, ngf=8)  # wrong widths
    spec2 = generator_spec(cfg2)
    params2, _ = init_network(jax.random.PRNGKey(1), spec2)
    with pytest.raises(ValueError):
        import_torch_generator(p, spec2, params2)
