"""Byte-level .t7 fixture authored BY HAND from the torch7 serialization
format — NOT produced by compat/t7.py's writer — breaking the reader<->writer
self-validation loop (VERDICT.md round-1 'what's weak' #2).

Byte layout transcribed from torch7's File.lua `writeObject` (
github.com/torch/torch7/blob/master/File.lua) and the Tensor/Storage write
methods, whose field order is independently confirmed by the widely-used
third-party reader `torchfile` (github.com/bshillingford/python-torchfile),
which was validated against real torch7 outputs:

  object   := int32 type_tag, payload
  tags     :  0 nil | 1 number | 2 string | 3 table | 4 torch | 5 boolean
  number   := float64 (Lua numbers are doubles — integer keys included)
  string   := int32 len, bytes
  table    := int32 heap_index [, int32 pair_count, pairs...]   (index seen
              before => back-reference, nothing follows)
  torch    := int32 heap_index [, string "V <ver>", string classname,
              payload]; nn modules without :write() serialize their field
              table as ONE table object
  Tensor   := int32 ndim, int64[ndim] sizes, int64[ndim] strides,
              int64 storage_offset (1-based), object (storage)
  Storage  := int64 count, raw little-endian elements
"""

import struct

import numpy as np

from dcgan_sr_tpu.compat.t7 import load_t7


def _i(v):
    return struct.pack("<i", v)


def _l(v):
    return struct.pack("<q", v)


def _d(v):
    return struct.pack("<d", float(v))


def _s(s):
    b = s.encode()
    return _i(len(b)) + b


def _num(v):
    return _i(1) + _d(v)


def _str_obj(s):
    return _i(2) + _s(s)


def _bool(v):
    return _i(5) + _i(1 if v else 0)


def build_fixture_bytes():
    """nn.Sequential{ modules = {1: SpatialConvolution}, train = true } with
    a weight FloatTensor, a SHARED back-reference to the same tensor, and a
    LongTensor — every structural feature the importer relies on."""
    w = np.arange(8, dtype=np.float32).reshape(2, 1, 2, 2) * 0.25 - 0.5
    out = b""
    # torch object #1: nn.Sequential
    out += _i(4) + _i(1) + _s("V 1") + _s("nn.Sequential")
    #   payload: table #2 with 2 pairs
    out += _i(3) + _i(2) + _i(2)
    #     "modules" -> table #3 {1: <module>}
    out += _str_obj("modules")
    out += _i(3) + _i(3) + _i(1)
    #       key 1 (a Lua number) -> torch object #4: nn.SpatialConvolution
    out += _num(1)
    out += _i(4) + _i(4) + _s("V 1") + _s("nn.SpatialConvolution")
    #         payload: table #5 with 6 pairs
    out += _i(3) + _i(5) + _i(6)
    #           "weight" -> torch object #6: FloatTensor(2,1,2,2)
    out += _str_obj("weight")
    out += _i(4) + _i(6) + _s("V 1") + _s("torch.FloatTensor")
    out += _i(4)                      # ndim
    out += _l(2) + _l(1) + _l(2) + _l(2)   # sizes
    out += _l(4) + _l(4) + _l(2) + _l(1)   # strides (contiguous)
    out += _l(1)                      # storage offset, 1-based
    #             storage: torch object #7: FloatStorage(8)
    out += _i(4) + _i(7) + _s("V 1") + _s("torch.FloatStorage")
    out += _l(8) + w.tobytes()
    #           "gradWeight" -> BACK-REFERENCE to object #6
    out += _str_obj("gradWeight")
    out += _i(4) + _i(6)
    #           conv geometry numbers
    for k, v in (("nInputPlane", 1), ("nOutputPlane", 2),
                 ("kW", 2), ("kH", 2)):
        out += _str_obj(k) + _num(v)
    #     "train" -> true
    out += _str_obj("train") + _bool(True)
    return out, w


def test_hand_authored_t7_parses(tmp_path):
    raw, w = build_fixture_bytes()
    p = tmp_path / "golden.t7"
    p.write_bytes(raw)
    obj = load_t7(str(p))
    assert obj.torch_type == "nn.Sequential"
    assert obj["train"] is True
    mods = obj["modules"]
    conv = mods[1]
    assert conv.torch_type == "nn.SpatialConvolution"
    assert conv["nOutputPlane"] == 2 and conv["kW"] == 2
    np.testing.assert_array_equal(conv["weight"], w)
    # the back-reference must resolve to the SAME parsed array
    assert conv["gradWeight"] is conv["weight"]


def test_hand_authored_t7_imports_into_params(tmp_path):
    """End-to-end: the hand-built Sequential maps onto a matching spec."""
    import jax
    from dcgan_sr_tpu.compat.torch_import import import_torch_generator
    from dcgan_sr_tpu.models.network import init_network

    raw, w = build_fixture_bytes()
    p = tmp_path / "golden.t7"
    p.write_bytes(raw)
    spec = ({"kind": "conv", "cin": 1, "cout": 2, "k": 2, "s": 1, "p": 0,
             "bn": False, "act": None},)
    params, _ = init_network(jax.random.PRNGKey(0), spec)
    out = import_torch_generator(str(p), spec, params)
    np.testing.assert_array_equal(np.asarray(out[0]["w"]), w)


def test_old_format_classname_without_version(tmp_path):
    """Pre-versioning torch files write the classname WHERE the version
    string would be (File.lua handles both) — the reader must too."""
    x = np.array([1.5, -2.5, 3.5], np.float32)
    raw = _i(4) + _i(1) + _s("torch.FloatTensor")
    raw += _i(1) + _l(3) + _l(1) + _l(1)
    raw += _i(4) + _i(2) + _s("torch.FloatStorage")
    raw += _l(3) + x.tobytes()
    p = tmp_path / "old.t7"
    p.write_bytes(raw)
    np.testing.assert_array_equal(load_t7(str(p)), x)


def test_noncontiguous_strides(tmp_path):
    """A transposed tensor serializes with swapped strides; the reader must
    apply them (as_strided) rather than assume contiguity."""
    base = np.arange(6, dtype=np.float32)
    raw = _i(4) + _i(1) + _s("V 1") + _s("torch.FloatTensor")
    raw += _i(2) + _l(3) + _l(2)      # sizes (3, 2)
    raw += _l(1) + _l(3)              # strides of a (2,3) transpose
    raw += _l(1)
    raw += _i(4) + _i(2) + _s("V 1") + _s("torch.FloatStorage")
    raw += _l(6) + base.tobytes()
    p = tmp_path / "strided.t7"
    p.write_bytes(raw)
    np.testing.assert_array_equal(
        load_t7(str(p)), base.reshape(2, 3).T)


def test_storage_offset_respected(tmp_path):
    """storageOffset is 1-based; a sub-tensor view starts mid-storage."""
    base = np.arange(10, dtype=np.float32)
    raw = _i(4) + _i(1) + _s("V 1") + _s("torch.FloatTensor")
    raw += _i(1) + _l(4) + _l(1)
    raw += _l(3)                       # 1-based offset 3 -> 0-based 2
    raw += _i(4) + _i(2) + _s("V 1") + _s("torch.FloatStorage")
    raw += _l(10) + base.tobytes()
    p = tmp_path / "offset.t7"
    p.write_bytes(raw)
    np.testing.assert_array_equal(load_t7(str(p)), base[2:6])
