"""Padding-friendly master-parameter layout for the optimizer hot path.

Measured problem (CLAUDE.md round-2 note): small 4-D conv weights like
(16, 8, 4, 4) get TPU tile layouts padded on the trailing (4, 4) dims to
(8, 128) tiles — ~64x padding waste — so every elementwise Adam pass over
params/m/v runs ~64x off the HBM roofline (~3.5 ms of a 22 ms gray-3 step).
A flat-vector Adam is WORSE (ravel of tiled tensors forces full relayout
passes, measured 16 ms).

The fix implemented here: store the MASTER copy of each conv weight as the
2-D matrix (dim0, rest) — e.g. (16, 128) — which tiles exactly, and
materialize the 4-D conv form once per step with a reshape.  XLA folds that
reshape into the conv's own weight preparation (convs consume weights as
(Cin*k*k, Cout) matrices on the MXU anyway), so the packing costs ~nothing
while Adam's 8 elementwise passes (m/v/p read+write, g read) run compact.

Opt-in via cfg.compact_params (torch getParameters-flattening analogue,
train.lua:202-203 — theirs is a memory trick, ours is a layout trick; the
update math is bit-identical either way).
"""

from __future__ import annotations


def pack_params(params):
    """Reshape each layer's conv weight to its compact 2-D master form."""
    return [
        {k: (v.reshape(v.shape[0], -1) if k == "w" else v)
         for k, v in p.items()}
        for p in params
    ]


def _w_shape(layer):
    k = layer["k"]
    if layer["kind"] == "conv":
        return (layer["cout"], layer["cin"], k, k)  # OIHW
    return (layer["cin"], layer["cout"], k, k)      # IOHW (conv-transpose)


def unpack_params(params, spec):
    """Materialize the 4-D conv weights from the 2-D masters (one reshape
    per weight, folded into the consuming conv by XLA)."""
    out = []
    for layer, p in zip(spec, params):
        if "w" in p:
            p = dict(p, w=p["w"].reshape(_w_shape(layer)))
        out.append(p)
    return out


def pack_state(state, g_spec, d_spec):
    """Pack a TrainState in place-of: params AND the Adam m/v moments."""
    from ..train.step import TrainState

    def pack_opt(opt):
        return {"m": pack_params(opt["m"]), "v": pack_params(opt["v"]),
                "t": opt["t"]}

    return TrainState(
        g_params=pack_params(state.g_params), g_state=state.g_state,
        g_opt=pack_opt(state.g_opt),
        d_params=pack_params(state.d_params), d_state=state.d_state,
        d_opt=pack_opt(state.d_opt),
        g_ema_params=(None if state.g_ema_params is None
                      else pack_params(state.g_ema_params)),
    )


def unpack_state(state, g_spec, d_spec):
    """Inverse of pack_state (for eval/inference/checkpoint interchange)."""
    from ..train.step import TrainState

    def unpack_opt(opt, spec):
        return {"m": unpack_params(opt["m"], spec),
                "v": unpack_params(opt["v"], spec), "t": opt["t"]}

    return TrainState(
        g_params=unpack_params(state.g_params, g_spec), g_state=state.g_state,
        g_opt=unpack_opt(state.g_opt, g_spec),
        d_params=unpack_params(state.d_params, d_spec), d_state=state.d_state,
        d_opt=unpack_opt(state.d_opt, d_spec),
        g_ema_params=(None if state.g_ema_params is None
                      else unpack_params(state.g_ema_params, g_spec)),
    )
