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

import functools

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


# ---- custom-VJP conv pair -------------------------------------------------
# JAX's generic conv transpose rules materialize spatial `reverse` ops on the
# LARGE activation cotangents (profiled at ~2.5 ms/step on the gray-3
# hourglass).  The k-s-p conv/conv-transpose pair are exact adjoints of each
# other with the SAME stored weights (no flip, no transpose):
#     d/dx conv2d(x, w, s, p)          = conv_transpose2d(dy, w, s, p)
#     d/dx conv_transpose2d(x, w, s, p) = conv2d(dy, w, s, p)
# (weight layouts line up because conv stores (O,I,kh,kw) and conv-transpose
# (I,O,kh,kw)).  These wrappers hand-route the activation gradient through the
# sibling op and keep autodiff only for the (tiny) weight gradient.


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv2d_cv(x, w, stride, padding, compute_dtype):
    return conv2d(x, w, stride, padding, compute_dtype=compute_dtype)


def _conv2d_cv_fwd(x, w, stride, padding, compute_dtype):
    return conv2d_cv(x, w, stride, padding, compute_dtype), (x, w)


_DN_DW = None  # built lazily: ("CNHW", "IOHW", "CNHW") — batch is contracted


def _dw_dims():
    global _DN_DW
    if _DN_DW is None:
        _DN_DW = lax.conv_dimension_numbers(
            (1, 1, 1, 1), (1, 1, 1, 1), ("CNHW", "IOHW", "CNHW"))
    return _DN_DW


def _dw_conv(long, short, k, s, p, compute_dtype):
    """Weight grad as a dilated conv with NO spatial reverses:
    dw[a, b, t] = sum_{batch, j} long[batch, a, s*j + t - p] short[batch, b, j].
    `long` is the higher-resolution tensor, `short` the kernel-like one."""
    prec = _precision(compute_dtype)
    if compute_dtype is not None:
        long = long.astype(compute_dtype)
        short = short.astype(compute_dtype)
    # geometry long == s*short (the k4s2p1 pair): the last tap needs
    # s*(short-1) + k-1-p - (long-1) = k - 2 - p of high padding
    pad_hi = k - 2 - p
    return lax.conv_general_dilated(
        long, short, window_strides=(1, 1),
        padding=((p, pad_hi), (p, pad_hi)),
        rhs_dilation=(s, s), dimension_numbers=_dw_dims(),
        precision=prec,
        preferred_element_type=jnp.float32)


def _conv2d_cv_bwd(stride, padding, compute_dtype, res, dy):
    x, w = res
    k = w.shape[-1]
    dx = conv_transpose2d(dy, w, stride, padding, compute_dtype=compute_dtype)
    if stride == 2 and k == 4 and padding == 1:
        # out spec "CNHW": C = rhs O (= dy's Co), N = lhs N (= x's Ci)
        # -> (Co, Ci, k, k), exactly conv2d's weight layout
        dw = _dw_conv(x, dy, k, stride, padding, compute_dtype).astype(w.dtype)
    else:
        _, w_vjp = jax.vjp(
            lambda w_: conv2d(x, w_, stride, padding,
                              compute_dtype=compute_dtype), w)
        (dw,) = w_vjp(dy)
    return dx.astype(x.dtype), dw


conv2d_cv.defvjp(_conv2d_cv_fwd, _conv2d_cv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv_transpose2d_cv(x, w, stride, padding, compute_dtype):
    return conv_transpose2d(x, w, stride, padding, compute_dtype=compute_dtype)


def _convT_cv_fwd(x, w, stride, padding, compute_dtype):
    return conv_transpose2d_cv(x, w, stride, padding, compute_dtype), (x, w)


def _convT_cv_bwd(stride, padding, compute_dtype, res, dy):
    x, w = res
    k = w.shape[-1]
    dx = conv2d(dy, w, stride, padding, compute_dtype=compute_dtype)
    if stride == 2 and k == 4 and padding == 1:
        # long=dy, short=x -> (Ci, Co, k, k), conv-transpose's weight layout
        dw = _dw_conv(dy, x, k, stride, padding, compute_dtype).astype(w.dtype)
    else:
        _, w_vjp = jax.vjp(
            lambda w_: conv_transpose2d(x, w_, stride, padding,
                                        compute_dtype=compute_dtype), w)
        (dw,) = w_vjp(dy)
    return dx.astype(x.dtype), dw


conv_transpose2d_cv.defvjp(_convT_cv_fwd, _convT_cv_bwd)


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
