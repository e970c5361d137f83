"""Criteria and the reference's three label schemes.

  - nn.MSECriterion / nn.BCECriterion, size-averaged (train.lua:142,
    train-gray-3.lua:101).
  - Label schemes (SURVEY.md §7.1): standard BCE (real 1 / fake 0 / G 1) and
    the error-regression MSE variants where D's fake target is the per-image
    reconstruction error (train.lua:237-245, train-gray.lua:258-265) and the
    real/G targets are small constants that differ per script.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..metrics import cal_mse_hw, cal_mse_quarter

_BCE_EPS = 1e-12


def mse_loss(pred, target):
    """Size-averaged MSE over a (B,) prediction vector."""
    return jnp.mean((pred - target) ** 2)


def bce_loss(pred, target):
    """Size-averaged binary cross-entropy; pred in (0,1) from a Sigmoid head.

    Torch's BCECriterion evaluates log(p) directly on the sigmoid output
    (clamping log at -100); we clamp p away from {0,1} which bounds the same
    quantity and keeps gradients finite under jit.
    """
    p = jnp.clip(pred, _BCE_EPS, 1.0 - _BCE_EPS)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def bce_with_logits_loss(logits, target):
    """BCE fused with the sigmoid head, evaluated from logits.

    Mathematically identical to bce_loss(sigmoid(logits), target) but stable:
    no log-of-saturated-sigmoid, gradients bounded by |sigmoid(l) - t| <= 1.
    The train step uses this for the BCE variants (the D spec's Sigmoid is
    folded into the loss); the reference's fp32 BCECriterion-on-sigmoid is the
    same function up to floating-point error.
    """
    logits = logits.astype(jnp.float32)
    return jnp.mean(jnp.maximum(logits, 0.0) - logits * target
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def criterion(cfg):
    return bce_loss if cfg.loss == "bce" else mse_loss


def make_labels(cfg, real, fake):
    """Returns (real_label_vec, fake_label_vec, g_label_vec), each (B,).

    `fake_label` may be the string "per_image_mse" (train-gray.lua:258-265,
    divisor H*W) or "per_image_quarter_mse" (train.lua:237-245, divisor
    4*C*H*W); those targets are plain numbers in the reference — no gradient
    flows through them (the caller stop-gradients fake first).
    """
    b = real.shape[0]
    real_vec = jnp.full((b,), cfg.real_label, jnp.float32)
    g_vec = jnp.full((b,), cfg.g_label, jnp.float32)
    if cfg.fake_label == "per_image_mse":
        fake_vec = cal_mse_hw(real, fake)
    elif cfg.fake_label == "per_image_quarter_mse":
        fake_vec = cal_mse_quarter(real, fake)
    else:
        fake_vec = jnp.full((b,), float(cfg.fake_label), jnp.float32)
    return real_vec, fake_vec, g_vec
