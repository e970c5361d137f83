"""Baseline-file provenance (bench_infer.record_regen).

BENCH lines stamp `baseline_host` from BASELINE_MEASURED.json's 'host'
field; a partial regeneration must therefore never attribute RETAINED
numbers to the new host (round-4 VERDICT weak-item 4 lineage).
"""
from dcgan_sr_tpu.utils.cache import machine_fingerprint

import bench_infer


def test_full_regen_sets_current_host():
    data = {}
    bench_infer.record_regen(data, ["gray-3", "rgb-full"])
    assert data["host"] == machine_fingerprint()[1]
    assert data["regenerated"][0] == {
        "variants": ["gray-3", "rgb-full"],
        "host": machine_fingerprint()[1]}


def test_partial_regen_marks_host_mixed():
    data = {"gray-3": 123.4, "note": "n", "host": "old-host"}
    bench_infer.record_regen(data, ["rgb-full"])
    assert data["host"].startswith("mixed")
    # the per-key record still names the new host for the regen'd key
    assert data["regenerated"][-1]["variants"] == ["rgb-full"]


def test_regen_of_every_measured_key_restores_attribution():
    data = {"gray-3": 123.4, "torch_cpu_overlap_mp_per_sec": 5.6,
            "host": "old-host", "regenerated": [
                {"variants": ["gray-3"], "host": "old-host"}]}
    bench_infer.record_regen(
        data, ["gray-3", "torch_cpu_overlap_mp_per_sec"])
    assert data["host"] == machine_fingerprint()[1]
    assert len(data["regenerated"]) == 2
