"""Patch decomposition: grid (non-overlapping) and overlapping extraction.

The reference turns one 64x64 image into 64 8x8 patches with triple host loops
(train-gray-patch.lua:267-274) and reassembles the same way (:588-596); the
overlap variant extracts 225 patches at stride=overlap
(train-gray-patch-batch-overlap.lua:387-399) and naive-stitches last-writer-
wins (:434-447).  Here both are pure reshapes/gathers that batch onto the TPU.

Patch index convention (row-major, reference `i` 1-based):
  grid:    block_row = (i-1) // P, block_col = (i-1) %  P, P = fine/patch
  overlap: x_index   = (i-1) // L, y_index   = (i-1) %  L, L = (fine-ov)/(patch-ov)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def extract_grid_patches(x, patch):
    """(..., H, W) -> (..., P*P, patch, patch), row-major blocks."""
    h, w = x.shape[-2], x.shape[-1]
    ph, pw = h // patch, w // patch
    lead = x.shape[:-2]
    y = x.reshape(lead + (ph, patch, pw, patch))
    y = jnp.moveaxis(y, -2, -3)  # (..., ph, pw, patch, patch)
    return y.reshape(lead + (ph * pw, patch, patch))


def reassemble_grid_patches(p, h, w):
    """Inverse of extract_grid_patches: (..., P*P, patch, patch) -> (..., H, W)."""
    patch = p.shape[-1]
    ph, pw = h // patch, w // patch
    lead = p.shape[:-3]
    y = p.reshape(lead + (ph, pw, patch, patch))
    y = jnp.moveaxis(y, -2, -3)  # (..., ph, patch, pw, patch)
    return y.reshape(lead + (h, w))


def overlap_grid(fine, patch, overlap):
    line = (fine - overlap) // (patch - overlap)
    return line, line * line


def extract_overlap_patches(x, patch, overlap):
    """(H, W) -> (L*L, patch, patch) at stride=overlap (overlap:387-399).

    NOTE the reference's stride is `overlap` itself (4), giving
    L = (fine-overlap)/(patch-overlap) = 15 rows of patches for 64/8/4.
    """
    h = x.shape[-1]
    line, _ = overlap_grid(h, patch, overlap)
    starts = np.arange(line) * overlap
    idx = starts[:, None] + np.arange(patch)[None, :]  # (line, patch)
    rows = x[..., idx, :]                   # (..., line, patch, W)
    tiles = rows[..., idx]                  # (..., line, patch, line, patch)
    tiles = jnp.moveaxis(tiles, -2, -3)     # (..., line, line, patch, patch)
    return tiles.reshape(x.shape[:-2] + (line * line, patch, patch))


def stitch_overlap_naive(patches, fine, patch, overlap):
    """Last-writer-wins placement in patch order (overlap:434-447).

    Later patches (larger i, i.e. larger row then larger col) overwrite the
    overlap bands of earlier ones.  Because writes happen in row-major patch
    order, each output pixel is owned by the patch with the largest (x_index,
    y_index) covering it — which is the patch whose window starts closest to
    the pixel.  Equivalently: pixel (r, c) comes from patch
    (min(r//ov, L-1) capped so the window fits, ...) — we just replay the
    writes with a scatter, which XLA turns into a gather from the last writer.
    """
    line, _ = overlap_grid(fine, patch, overlap)
    # Compute, for each output pixel, the index of the last patch covering it.
    r = np.arange(fine)
    # block index of last patch whose window [b*ov, b*ov+patch) covers r
    # (windows at stride ov with patch >= ov always cover r at b = r//ov,
    # clamped to the final block for the right/bottom margin):
    b_last = np.minimum(r // overlap, line - 1)
    off = r - b_last * overlap
    pi = b_last[:, None] * line + b_last[None, :]          # (fine, fine) patch idx
    out = patches[..., pi, off[:, None], off[None, :]]
    return out
