"""Fused convT(k4s2p1) + BatchNorm + ReLU + conv(k4s2p1) Pallas kernel.

The gray-3 generator's hot pair (train-gray-3.lua:60-66: SpatialFullConvolution
16ch 256->512 + BN + ReLU feeding SpatialConvolution 8->16ch 512->256) keeps a
(B, 8, 512, 512) activation alive in HBM: XLA materializes it for the BN
reductions, the normalize pass, and the consumer conv.  This kernel never
materializes it: each grid program computes a row-band of the hidden tensor in
VMEM, normalizes with precomputed batch stats, and immediately consumes it
with the second conv.  Batch statistics come from a first (stats) pass that
recomputes the convT band — trading FLOPs for HBM traffic.

Math notes (see tests/test_pallas_fused.py for exactness proofs):
  * convT k4s2p1 decomposes into 4 output-parity convs.  With output parity
    (di, dj) and 2x2 input window offsets (ti, tj):
        h[2i+di, 2j+dj] = sum_{ti,tj} x[i+di-1+ti, j+dj-1+tj] @ W(di,dj,ti,tj)
    where W(...)[ci, cm] = wT[ci, cm, 3-di-2ti, 3-dj-2tj] — and in LOCAL tile
    coordinates all four parities read the SAME shifted 2x2 windows, so one
    patch matrix (.., 4*Ci) times one packed weight (4*Ci, 4*Cm) computes all
    parities in a single MXU pass (4x the lane utilization of a naive
    Cout=8 lowering).
  * the consumer conv k4s2p1 gathers a 2x2 window from EACH parity plane:
        y[m, n] = sum_{k, sa, sb} P_k[m+sa, n+sb] @ wC[co, cm, a(k,sa), b(k,sb)]
    packed the same way into one (.., 16*Cm=128) @ (128, Co) matmul (full K).

First-generation NHWC draft: exact in interpret mode but does NOT pass
Mosaic lowering on real TPUs (lane-offset concat + small-minor-dim tile
padding — see docs/fused_bulge.md). Superseded by the flat-lane form in
ops/pallas_bulge.py, which lowers and runs but measured 3.6x slower than
XLA's unfused composition — negative result recorded; no config flag.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pack_wT(wT):
    """(Ci, Cm, 4, 4) IOHW -> (4*Ci, 4*Cm): rows (ti,tj,ci), cols (di,dj,cm)."""
    ci, cm = wT.shape[0], wT.shape[1]
    out = jnp.zeros((4 * ci, 4 * cm), wT.dtype)
    for ti in (0, 1):
        for tj in (0, 1):
            r = (ti * 2 + tj)
            for di in (0, 1):
                for dj in (0, 1):
                    c = (di * 2 + dj)
                    blk = wT[:, :, 3 - di - 2 * ti, 3 - dj - 2 * tj]
                    out = out.at[r * ci:(r + 1) * ci,
                                 c * cm:(c + 1) * cm].set(blk)
    return out


def _pack_wC(wC):
    """(Co, Cm, 4, 4) OIHW -> (16*Cm, Co): rows (k=di*2+dj, sa, sb, cm)."""
    co, cm = wC.shape[0], wC.shape[1]
    out = jnp.zeros((16 * cm, co), wC.dtype)
    for k in range(4):
        di, dj = k // 2, k % 2
        for sa in (0, 1):
            a = (1 + 2 * sa) if di == 0 else 2 * sa
            for sb in (0, 1):
                b = (1 + 2 * sb) if dj == 0 else 2 * sb
                r = ((k * 2 + sa) * 2 + sb)
                out = out.at[r * cm:(r + 1) * cm, :].set(wC[:, :, a, b].T)
    return out


def _wpad(w):
    """Columns are padded so the second-minor dim of the flattened patch
    matrix is sublane-aligned (Mosaic reshape constraint)."""
    return -(w + 1) % 16


def _parts_from_window(xw, xp_ref, wtall, tm, w, ci, cm):
    """xw: (TM+2, W+2, Ci) -> flat parts (TM+1, W+1, 4*Cm), one packed matmul.

    Part k = di*2+dj lives in lanes [k*Cm, (k+1)*Cm).  The 4 shifted 2x2
    windows are STORED into the xp scratch's lane blocks — Mosaic cannot
    lane-concatenate vectors whose slices carry different sublane/lane
    offsets, but stores canonicalize the layout."""
    wp = _wpad(w)
    for idx, (ti, tj) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        xp_ref[:, :w + 1, idx * ci:(idx + 1) * ci] = \
            xw[ti:ti + tm + 1, tj:tj + w + 1, :]
    xp = xp_ref[...]                                  # (TM+1, W+1+wp, 4Ci)
    p = jnp.dot(xp.reshape((tm + 1) * (w + 1 + wp), 4 * ci), wtall,
                preferred_element_type=jnp.float32)
    p = p.reshape(tm + 1, w + 1 + wp, 4 * cm)
    return p[:, :w + 1, :]  # pad columns hold garbage -> sliced away


def _stats_kernel(px_ref, wtall_ref, sums_ref, xw, xp_s, sem, *, tm, w, ci, cm):
    b = pl.program_id(0)
    t = pl.program_id(1)
    dma = pltpu.make_async_copy(
        px_ref.at[b, pl.ds(t * tm, tm + 2)], xw, sem)
    dma.start()
    dma.wait()
    p = _parts_from_window(xw[...], xp_s, wtall_ref[...], tm, w, ci, cm)
    # real h cells in local coords: di=0 -> rows [0,TM), di=1 -> rows [1,TM];
    # dj=0 -> cols [0,W), dj=1 -> cols [1,W]  (phase-1 tiling has no pads)
    s = jnp.zeros((cm,), jnp.float32)
    sq = jnp.zeros((cm,), jnp.float32)
    for k in range(4):
        di, dj = k // 2, k % 2
        blk = p[di:di + tm, dj:dj + w, k * cm:(k + 1) * cm]
        s = s + jnp.sum(blk, axis=(0, 1))
        sq = sq + jnp.sum(blk * blk, axis=(0, 1))
    sums_ref[0, 0, 0] = s
    sums_ref[0, 0, 1] = sq


def _main_kernel(px_ref, wtall_ref, wcall_ref, stats_ref, y_ref, xw, xp_s,
                 yp_s, sem, *, tm, w, ci, cm, co, n_tiles, out_dtype):
    b = pl.program_id(0)
    t = pl.program_id(1)
    dma = pltpu.make_async_copy(
        px_ref.at[b, pl.ds(t * tm, tm + 2)], xw, sem)
    dma.start()
    dma.wait()
    p = _parts_from_window(xw[...], xp_s, wtall_ref[...], tm, w, ci, cm)

    # BN normalize + ReLU on the flat parts: stats_ref rows are the (4*Cm)
    # part-tiled vectors (mean, scale/sqrt(var+eps), bias)
    p = (p - stats_ref[0][None, None, :]) * stats_ref[1][None, None, :] \
        + stats_ref[2][None, None, :]
    p = jnp.maximum(p, 0.0)

    # zero the consumer-padding cells (h rows/cols outside [0, 2H) x [0, 2W))
    # with pure selects — per-part masks differ only at one row/col each
    rows = jax.lax.broadcasted_iota(jnp.int32, (tm + 1, w + 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tm + 1, w + 1), 1)
    first_tile = t == 0
    last_tile = t == n_tiles - 1
    parts = []
    for k in range(4):
        di, dj = k // 2, k % 2
        if dj == 0:
            m = cols == w                # even-col part: j=W is h col 2W
        else:
            m = cols == 0                # odd-col part: j=-1 is h col -1
        if di == 0:
            m = m | ((rows == tm) & last_tile)   # even-row i=H -> h row 2H
        else:
            m = m | ((rows == 0) & first_tile)   # odd-row i=-1 -> h row -1
        blk = p[:, :, k * cm:(k + 1) * cm]
        parts.append(jnp.where(m[:, :, None], 0.0, blk).astype(out_dtype))

    # consumer conv: one (TM*W, 16*Cm) @ (16*Cm, Co) matmul; the 16 shifted
    # part windows are stored into the yp scratch's lane blocks (see
    # _parts_from_window for why stores instead of a concat)
    n = 0
    for k in range(4):
        for sa in (0, 1):
            for sb in (0, 1):
                yp_s[:, :, n * cm:(n + 1) * cm] = \
                    parts[k][sa:sa + tm, sb:sb + w, :]
                n += 1
    yp = yp_s[...]                                   # (TM, W, 16Cm)
    y = jnp.dot(yp.reshape(tm * w, 16 * cm), wcall_ref[...],
                preferred_element_type=jnp.float32)
    y_ref[0] = y.reshape(tm, w, co).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "tm", "interpret"))
def fused_convT_bn_relu_conv(x, wT, scale, bias, wC, *, eps=1e-5, tm=32,
                             interpret=False):
    """y = conv_s2p1k4(relu(bn(convT_s2p1k4(x)))) without materializing the
    2x-resolution hidden tensor in HBM.

    x: (B, Ci, H, W); wT: (Ci, Cm, 4, 4) IOHW; wC: (Co, Cm, 4, 4) OIHW;
    scale/bias: (Cm,).  Returns (y: (B, Co, H, W), (mean, biased_var)) with
    train-mode batch statistics of the hidden tensor (for BN running stats).
    """
    bsz, ci, h, w = x.shape
    cm = wT.shape[1]
    co = wC.shape[0]
    assert h % tm == 0, (h, tm)
    n_tiles = h // tm

    # Mosaic DMA slices must be tile-aligned on the trailing (sublane, lane)
    # dims; pad the W axis (sublane of the NHWC layout) to a multiple of 8 so
    # the full-extent copy of each row band is aligned.
    wq = -(-(w + 2) // 8) * 8
    xl = jnp.pad(x.transpose(0, 2, 3, 1),
                 ((0, 0), (1, 1), (1, wq - w - 1), (0, 0)))
    wtall = _pack_wT(wT).astype(x.dtype)
    wcall = _pack_wC(wC).astype(x.dtype)

    # ---- phase 1: batch statistics of the hidden tensor --------------------
    sums = pl.pallas_call(
        functools.partial(_stats_kernel, tm=tm, w=w, ci=ci, cm=cm),
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4 * ci, 4 * cm), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 2, cm), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n_tiles, 2, cm), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tm + 2, wq, ci), x.dtype),
            pltpu.VMEM((tm + 1, w + 1 + _wpad(w), 4 * ci), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xl, wtall)
    n = bsz * (2 * h) * (2 * w)
    mean = sums[:, :, 0].sum(axis=(0, 1)) / n
    var = sums[:, :, 1].sum(axis=(0, 1)) / n - mean * mean  # biased (torch BN)
    gain = scale / jnp.sqrt(var + eps)
    # part-tiled (4*Cm) vectors so the kernel normalizes the flat parts
    stats = jnp.stack([jnp.tile(mean, 4), jnp.tile(gain, 4),
                       jnp.tile(bias, 4)]).astype(jnp.float32)

    # ---- phase 2: recompute, normalize, consume -----------------------------
    y = pl.pallas_call(
        functools.partial(_main_kernel, tm=tm, w=w, ci=ci, cm=cm, co=co,
                          n_tiles=n_tiles, out_dtype=x.dtype),
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4 * ci, 4 * cm), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * cm, co), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 4 * cm), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, w, co), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tm + 2, wq, ci), x.dtype),
            pltpu.VMEM((tm + 1, w + 1 + _wpad(w), 4 * ci), x.dtype),
            pltpu.VMEM((tm, w, 16 * cm), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xl, wtall, wcall, stats)
    return y.transpose(0, 3, 1, 2), (mean, var)
