"""Pure-logic tests for the benchmark harness (naf_tpu/bench/harness.py).

Locks the protocol and merge semantics the round-4 advisor flagged:
the img_size sweep must follow the reference's create_tensors contract
(test/test_utils.py:79-83 — output size is ratio*lr_size, independent of
the guidance-image size), and refreshed rows must keep device-measured
memory fields together with their provenance (method + measured-at stamp).
No device work: everything here is dict plumbing.
"""

from naf_tpu.bench.harness import _config_from_factor, _merge_row


def test_img_size_sweep_keeps_output_fixed():
    # Reference protocol: sweeping img_size varies ONLY the guidance
    # resolution; output stays ratio*lr_size = 16*28 = 448.
    for img in (112, 224, 448, 896):
        cfg = _config_from_factor("img_size", img)
        assert cfg["img_size"] == img
        assert cfg["ratio"] == 16 and cfg["lr_size"] == 28
        assert cfg["out_size"] == 448


def test_ratio_sweep_keeps_guidance_fixed():
    cfg = _config_from_factor("ratio", 32)
    assert cfg["img_size"] == 448
    assert cfg["out_size"] == 32 * 28


def test_merge_row_carries_measured_mem_with_provenance():
    old = {
        "model": "NAF", "fwd_ms": 10.0, "bwd_ms": 30.0,
        "fwd_mem_measured_mb": 1536, "bwd_mem_measured_mb": 4608,
        "mem_measured_method": "oom-bisect, one trial per subprocess",
        "mem_measured_at": "abc1234",
    }
    new = {"model": "NAF", "fwd_ms": 9.0, "bwd_ms": 28.0}
    merged = _merge_row(old, new)
    # fresh timings win ...
    assert merged["fwd_ms"] == 9.0 and merged["bwd_ms"] == 28.0
    # ... and the measured-memory group travels as a unit
    assert merged["fwd_mem_measured_mb"] == 1536
    assert merged["bwd_mem_measured_mb"] == 4608
    assert merged["mem_measured_method"].startswith("oom-bisect")
    assert merged["mem_measured_at"] == "abc1234"


def test_merge_row_never_downgrades_backward_to_absence():
    old = {"model": "NAF", "fwd_ms": 10.0, "bwd_ms": 30.0,
           "bwd_mem_mb": 4000.0}
    new = {"model": "NAF", "fwd_ms": 9.5,
           "bwd_skip": "backward disabled for this run (--no-backward)"}
    merged = _merge_row(old, new)
    assert merged["bwd_ms"] == 30.0
    assert merged["bwd_mem_mb"] == 4000.0
    assert "bwd_skip" not in merged
    assert "carried" in merged["bwd_note"]


def test_merge_row_respects_structured_backward_failure():
    # A row that FAILED backward (bwd_error) must keep the failure marker,
    # not resurrect the stale number silently.
    old = {"model": "NAF", "fwd_ms": 10.0, "bwd_ms": 30.0}
    new = {"model": "NAF", "fwd_ms": 9.5, "bwd_error": "HTTP 500"}
    merged = _merge_row(old, new)
    assert "bwd_ms" not in merged
    assert merged["bwd_error"] == "HTTP 500"


def test_merge_row_fresh_measurement_wins():
    old = {"model": "NAF", "bwd_ms": 3092.0}
    new = {"model": "NAF", "fwd_ms": 9.5, "bwd_ms": 120.0}
    assert _merge_row(old, new)["bwd_ms"] == 120.0
