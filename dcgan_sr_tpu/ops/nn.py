"""Core NN ops with Torch7-`nn` semantics, expressed as XLA-friendly JAX ops.

Replicates the L2 op inventory of the reference (SURVEY.md §2.3):
  SpatialConvolution        -> conv2d            (train.lua:108-133)
  SpatialFullConvolution    -> conv_transpose2d  (train.lua:99-105; k4s2p1)
  SpatialBatchNormalization -> batch_norm        (eps 1e-5, train-mode stats)
  ReLU / LeakyReLU(0.2) / Sigmoid / Tanh
  SpatialUpSamplingNearest  -> upsample_nearest  (train-gray.lua:104)

Layouts are Torch-native so golden tests against torch-CPU are direct:
  activations NCHW; conv weight (Cout, Cin, kH, kW); conv-transpose weight
  (Cin, Cout, kH, kW).  All convolutions are bias-free — the reference strips
  biases at init (`m:noBias()`, train.lua:46).

All ops are pure functions of (params, x) so the whole train step fuses into
one XLA program; no data-dependent shapes anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NCHW", "OIHW", "NCHW"))
# transposed-conv kernels stay in their torch (I, O, H, W) layout — XLA takes
# IOHW dimension numbers directly, avoiding a per-step relayout transpose
_DN_T = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NCHW", "IOHW", "NCHW"))


def _precision(compute_dtype):
    # fp32 parity path: force full-precision accumulation (XLA's DEFAULT lowers
    # fp32 convs to bf16 multiplies on the MXU — fine only when explicitly
    # running the bf16 compute path).
    return lax.Precision.DEFAULT if compute_dtype is not None else lax.Precision.HIGHEST


def conv2d(x, w, stride=1, padding=0, *, compute_dtype=None):
    """2D cross-correlation, NCHW x OIHW -> NCHW (Torch SpatialConvolution, no bias)."""
    s = (stride, stride) if isinstance(stride, int) else stride
    p = ((padding, padding), (padding, padding)) if isinstance(padding, int) else padding
    prec = _precision(compute_dtype)
    if compute_dtype is not None:
        # bf16 in/out: MXU accumulates in fp32 internally; keeping the output
        # dtype equal to the input dtype keeps the AD transpose rules
        # dtype-consistent (a f32 preferred_element_type breaks the vjp).
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        return lax.conv_general_dilated(
            x, w, window_strides=s, padding=p,
            dimension_numbers=_DN, precision=prec)
    return lax.conv_general_dilated(
        x, w, window_strides=s, padding=p,
        dimension_numbers=_DN,
        precision=prec,
        preferred_element_type=jnp.float32,
    )


def conv_transpose2d(x, w, stride=2, padding=1, *, compute_dtype=None):
    """Transposed conv (Torch SpatialFullConvolution), weight (Cin, Cout, kH, kW).

    out = (in - 1)*stride - 2*padding + k  (k4 s2 p1 => exactly 2x upsampling,
    train.lua:99).  Implemented as an input-dilated convolution with the kernel
    flipped spatially and I/O transposed — the gradient-of-conv formulation XLA
    maps straight onto the MXU.
    """
    cin, cout, kh, kw = w.shape
    s = (stride, stride) if isinstance(stride, int) else stride
    if isinstance(padding, int):
        padding = (padding, padding)
    # flip spatial dims only; the I/O swap is expressed via IOHW dimension
    # numbers (a transpose here costs a full relayout pass every step)
    w_f = jnp.flip(w, axis=(2, 3))
    pads = tuple((k - 1 - p, k - 1 - p) for k, p in zip((kh, kw), padding))
    prec = _precision(compute_dtype)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w_f = w_f.astype(compute_dtype)
        return lax.conv_general_dilated(
            x, w_f, window_strides=(1, 1), padding=pads,
            lhs_dilation=s, dimension_numbers=_DN_T, precision=prec)
    return lax.conv_general_dilated(
        x, w_f, window_strides=(1, 1), padding=pads,
        lhs_dilation=s,
        dimension_numbers=_DN_T,
        precision=prec,
        preferred_element_type=jnp.float32,
    )


def batch_norm(x, scale, bias, *, state=None, train=True, eps=1e-5, momentum=0.1,
               axis_name=None):
    """Torch SpatialBatchNormalization semantics.

    Training uses biased batch statistics over (N, H, W) — the reference never
    calls `:evaluate()`, so its eval paths also run with batch stats; keep
    `train=True` for output-parity with the reference (SURVEY.md §7.4).

    `axis_name` enables cross-replica BN under shard_map: statistics are
    pmean-reduced over the data-parallel mesh axis so a sharded batch
    normalizes exactly like the reference's single-device full batch.

    Returns (y, new_state) where state = {"mean","var"} running stats
    (unbiased var, momentum 0.1, Torch defaults).
    """
    in_dtype = x.dtype
    if train:
        # stats always accumulate in fp32 (XLA fuses the cast into the
        # reduction, so bf16 tensors are read once at bf16 width)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 2, 3))
        mean_sq = jnp.mean(xf * xf, axis=(0, 2, 3))
        n = x.shape[0] * x.shape[2] * x.shape[3]
        if axis_name is not None:
            mean = lax.pmean(mean, axis_name)
            mean_sq = lax.pmean(mean_sq, axis_name)
            n = n * lax.psum(1, axis_name)
        var = mean_sq - mean * mean  # biased, matches Torch train-mode
        new_state = None
        if state is not None:
            unbiased = var * (n / jnp.maximum(n - 1, 1))
            new_state = {
                "mean": (1 - momentum) * state["mean"] + momentum * mean,
                "var": (1 - momentum) * state["var"] + momentum * unbiased,
            }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = lax.rsqrt(var + eps)
    if in_dtype == jnp.float32:
        # exact Torch formula ordering for parity
        y = (x - mean[None, :, None, None]) * (inv * scale)[None, :, None, None]
        y = y + bias[None, :, None, None]
    else:
        # bf16 path: fold into a single per-channel affine so big-tensor
        # traffic stays at bf16 width (bandwidth is the roofline for these
        # hourglass generators)
        a = (inv * scale).astype(in_dtype)
        b = (bias - mean * inv * scale).astype(in_dtype)
        y = x * a[None, :, None, None] + b[None, :, None, None]
    return y, new_state


def relu(x):
    return jnp.maximum(x, 0)


def leaky_relu(x, slope=0.2):
    return jnp.where(x >= 0, x, x * slope)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def tanh(x):
    return jnp.tanh(x)


def upsample_nearest(x, factor=2):
    """SpatialUpSamplingNearest: repeat each pixel factor x factor (NCHW)."""
    x = jnp.repeat(x, factor, axis=2)
    return jnp.repeat(x, factor, axis=3)
