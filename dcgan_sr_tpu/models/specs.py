"""The seven reference variants' generator/discriminator topologies as specs.

Every generator is a point in one family: optional nearest-upsample prefix,
k4s2p1 transposed-conv up-stack, k4s2p1 strided-conv down-stack, Tanh or
Sigmoid head, BN optional (SURVEY.md §7.1).  Discriminators are either the
64x64 5-layer DCGAN-D or the 8x8 patch-D with 3x3 valid convs.

Per-variant sources in the reference:
  rgb-full G  train.lua:97-113          D  train.lua:119-137
  gray G      train-gray.lua:102-117    D  train-gray.lua:123-141  (G has NO BN)
  gray-2 G    train-gray-2.lua:65-77    D  train-gray-2.lua:82-100
  gray-3 G    train-gray-3.lua:52-73    D  train-gray-3.lua:77-95
  gray-patch G train-gray-patch.lua:54-76   D train-gray-patch.lua:94-109
  gray-patch-batch G train-gray-patch-batch.lua:55-78  D :81-97
  overlap G   train-gray-patch-batch-overlap.lua:76-103 (== gray-patch G) D :106-122
"""

from __future__ import annotations


def _up(f=2):
    return {"kind": "upsample", "factor": f}


def _convT(cin, cout, bn=True, act="relu", k=4, s=2, p=1):
    return {"kind": "convT", "cin": cin, "cout": cout, "k": k, "s": s, "p": p,
            "bn": bn, "act": act}


def _conv(cin, cout, bn=True, act="relu", k=4, s=2, p=1):
    return {"kind": "conv", "cin": cin, "cout": cout, "k": k, "s": s, "p": p,
            "bn": bn, "act": act}


def _flat():
    return {"kind": "flatten"}


def generator_spec(cfg):
    v, nc, g = cfg.variant, cfg.nc, cfg.ngf
    if v == "rgb-full":
        # 32 -> 64 -> 128 -> 256 -> 128 -> 64 (train.lua:97-113)
        return (
            _convT(nc, g * 8), _convT(g * 8, g * 4), _convT(g * 4, g * 2),
            _conv(g * 2, g, act="lrelu"),
            _conv(g, nc, bn=False, act="tanh"),
        )
    if v == "gray":
        # upsample + 2 FullConv up + 2 conv down, NO BN (train-gray.lua:102-117)
        return (
            _up(),
            _convT(nc, g * 4, bn=False, act=None),
            _convT(g * 4, g * 2, bn=False, act=None),
            _conv(g * 2, g, bn=False, act=None),
            _conv(g, nc, bn=False, act="tanh"),
        )
    if v == "gray-2":
        # 3x nearest-up to 256, 2 stride-2 convs down (train-gray-2.lua:65-77)
        return (
            _up(), _up(), _up(),
            _conv(nc, g),
            _conv(g, nc, bn=False, act="sigmoid"),
        )
    if v == "gray-3":
        # hourglass to 512 and back (train-gray-3.lua:52-73)
        return (
            _up(),
            _convT(nc, g * 4), _convT(g * 4, g * 2), _convT(g * 2, g),
            _conv(g, g * 2), _conv(g * 2, g * 4),
            _conv(g * 4, nc, bn=False, act="sigmoid"),
        )
    if v in ("gray-patch", "gray-patch-batch-overlap"):
        # 4px patch -> up 8 -> T16 -> T32 -> T64 -> c32 -> c16 -> 8
        # (train-gray-patch.lua:54-76; overlap:76-103 is identical as-committed)
        return (
            _up(),
            _convT(nc, g * 4), _convT(g * 4, g * 2), _convT(g * 2, g),
            _conv(g, g * 2), _conv(g * 2, g * 4),
            _conv(g * 4, nc, bn=False, act="sigmoid"),
        )
    if v == "gray-patch-batch":
        # all-conv: 4 FullConvs up (4->64) then 3 convs down (->8)
        # (train-gray-patch-batch.lua:55-78)
        return (
            _convT(nc, g * 8), _convT(g * 8, g * 4), _convT(g * 4, g * 2),
            _convT(g * 2, g),
            _conv(g, g * 2), _conv(g * 2, g * 4),
            _conv(g * 4, nc, bn=False, act="sigmoid"),
        )
    raise KeyError(v)


def discriminator_spec(cfg):
    nc, d = cfg.nc, cfg.ndf
    if cfg.disc == "dcgan64":
        # 64 -> 32 -> 16 -> 8 -> 4 -> 1 (train.lua:119-137)
        return (
            _conv(nc, d, bn=False, act="lrelu"),
            _conv(d, d * 2, act="lrelu"),
            _conv(d * 2, d * 4, act="lrelu"),
            _conv(d * 4, d * 8, act="lrelu"),
            _conv(d * 8, 1, bn=False, act="sigmoid", k=4, s=1, p=0),
            _flat(),
        )
    if cfg.disc == "patch8":
        # 8 -> 6 -> 4 -> 2 -> 1 with 3x3 valid convs (train-gray-patch.lua:94-109)
        return (
            _conv(nc, d, bn=False, act="lrelu", k=3, s=1, p=0),
            _conv(d, d * 2, act="lrelu", k=3, s=1, p=0),
            _conv(d * 2, d * 4, act="lrelu", k=3, s=1, p=0),
            _conv(d * 4, 1, bn=False, act="sigmoid", k=2, s=1, p=0),
            _flat(),
        )
    raise KeyError(cfg.disc)
