"""Driver-entry contract: ``dryrun_multichip`` must self-provision devices.

Round-1 regression: the driver invoked ``dryrun_multichip(8)`` in a fresh
process that saw only the single axon TPU device and died on a device-count
assert (MULTICHIP_r01.json ok=false).  The function now forces an 8-wide
virtual CPU platform itself (and re-execs in a subprocess if a backend was
already committed), so this test exercises the same code path the driver
runs.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import __graft_entry__  # noqa: E402


def test_dryrun_multichip_runs_full_sharded_step():
    # Under the test conftest 8 virtual CPU devices already exist, so this
    # takes the in-process path: 4x2 (data x model) mesh, full train step,
    # TP-sharded params assert, sharded fused sampling.
    __graft_entry__.dryrun_multichip(8)


def test_ensure_virtual_cpu_idempotent():
    assert __graft_entry__._ensure_virtual_cpu(8)
    assert __graft_entry__._ensure_virtual_cpu(8)  # second call: no-op, still ok


def test_bench_multichip_virtual_mesh():
    """`bench.py multichip` runs green on the 8-virtual-CPU mesh and reports
    aggregate + per-device scenes/s (VERDICT r2 item 8)."""
    import bench

    line = bench.multichip_metric(8)
    assert line["n_devices"] == 8
    assert line["value"] > 0
    # both fields are independently rounded to 3 decimals in the JSON line,
    # so allow the worst-case combined rounding slop
    assert abs(line["per_device_scenes_per_sec"] - line["value"] / 8) < 1e-3
