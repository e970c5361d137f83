"""Import a reference Torch checkpoint (nn.Sequential netG) into our params.

Maps the serialized module chain of a `.t7` generator/discriminator (e.g.
`checkpoints/<name>_<epoch>_net_G.t7`, train.lua:298) onto the matching
layer-spec params pytree:
  nn.SpatialConvolution        weight (nOut, nIn, kH, kW)  -> conv "w"
  nn.SpatialFullConvolution    weight (nIn, nOut, kH, kW)  -> convT "w"
  nn.SpatialBatchNormalization weight/bias/running_*       -> bn_scale/bn_bias
  nn.SpatialUpSamplingNearest / nn.ReLU / nn.LeakyReLU / nn.Sigmoid /
  nn.Tanh / nn.View            parameter-free, consumed positionally

Weight layouts match ours exactly (ops/nn.py uses torch layouts), so the
import is a reshape-free copy.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .t7 import T7Object, load_t7

_PARAM_FREE = {
    "nn.SpatialUpSamplingNearest", "nn.ReLU", "nn.LeakyReLU", "nn.Sigmoid",
    "nn.Tanh", "nn.View", "nn.Reshape", "cudnn.ReLU", "cudnn.Sigmoid",
    "cudnn.Tanh",
}
_CONV = {"nn.SpatialConvolution", "cudnn.SpatialConvolution"}
_CONVT = {"nn.SpatialFullConvolution", "cudnn.SpatialFullConvolution"}
_BN = {"nn.SpatialBatchNormalization", "cudnn.SpatialBatchNormalization"}


def _modules(seq: T7Object):
    mods = seq["modules"]
    # lua arrays serialize as {1: m1, 2: m2, ...}
    return [mods[k] for k in sorted(mods)]


def import_torch_sequential(obj: T7Object, spec, params, state=None):
    """Copy weights from a deserialized nn.Sequential into `params` (new list).

    `spec`/`params` from models.init_network.  Consumes the torch module list
    positionally: each spec conv/convT layer takes one conv module and, if
    bn=True, the following BatchNormalization module.

    If a `state` pytree is given, BN running statistics (running_mean /
    running_var — torch keeps them even in train mode) are copied into a new
    state list returned as the second element, enabling running-stats
    inference (infer.tiled.make_generator_fn(bn_eval=True)).
    """
    if obj.torch_type != "nn.Sequential":
        raise ValueError(f"expected nn.Sequential, got {obj.torch_type}")
    mods = _modules(obj)
    out = [dict(p) for p in params]
    out_state = None if state is None else [dict(s) for s in state]
    mi = 0

    def next_module():
        nonlocal mi
        while mi < len(mods) and mods[mi].torch_type in _PARAM_FREE:
            mi += 1
        if mi >= len(mods):
            raise ValueError("ran out of torch modules while mapping spec")
        m = mods[mi]
        mi += 1
        return m

    for li, layer in enumerate(spec):
        kind = layer["kind"]
        if kind not in ("conv", "convT"):
            continue
        m = next_module()
        want = _CONV if kind == "conv" else _CONVT
        if m.torch_type not in want:
            raise ValueError(
                f"layer {li}: expected {sorted(want)}, got {m.torch_type}")
        w = np.asarray(m["weight"], np.float32)
        if w.shape != out[li]["w"].shape:
            raise ValueError(f"layer {li}: weight shape {w.shape} != "
                             f"{out[li]['w'].shape}")
        out[li]["w"] = jnp.asarray(w)
        if layer.get("bn"):
            bn = next_module()
            if bn.torch_type not in _BN:
                raise ValueError(f"layer {li}: expected BatchNormalization, "
                                 f"got {bn.torch_type}")
            out[li]["bn_scale"] = jnp.asarray(np.asarray(bn["weight"], np.float32))
            out[li]["bn_bias"] = jnp.asarray(np.asarray(bn["bias"], np.float32))
            if out_state is not None and "running_mean" in bn:
                out_state[li]["bn"] = {
                    "mean": jnp.asarray(
                        np.asarray(bn["running_mean"], np.float32)),
                    "var": jnp.asarray(
                        np.asarray(bn["running_var"], np.float32)),
                }
    if state is not None:
        return out, out_state
    return out


def import_torch_generator(path, spec, params, state=None):
    """Load a reference netG/netD `.t7` file into matching params.

    With `state`, also returns the BN running stats (see
    import_torch_sequential)."""
    return import_torch_sequential(load_t7(path), spec, params, state)
