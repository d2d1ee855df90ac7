"""Infra tests: orbax checkpoint round-trip with model_{epoch} discovery,
bounds persistence, stats logger aggregation, config loading."""
import io
import os

import jax
import jax.numpy as jnp
import numpy as np

from diffuscene_tpu.utils import (
    AverageAggregator,
    StatsLogger,
    latest_epoch,
    load_bounds,
    load_checkpoint,
    load_config,
    save_bounds,
    save_checkpoint,
)


def test_checkpoint_roundtrip(tmp_path):
    exp = str(tmp_path / "exp")
    state = {
        "step": jnp.asarray(7, jnp.int32),
        "params": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)},
    }
    assert latest_epoch(exp) is None
    save_checkpoint(state, exp, 10)
    save_checkpoint(jax.tree.map(lambda x: x + 1, state), exp, 250)
    assert latest_epoch(exp) == 250

    template = jax.tree.map(jnp.zeros_like, state)
    restored, epoch = load_checkpoint(template, exp)
    assert epoch == 250
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(6, dtype=np.float32).reshape(2, 3) + 1)
    # explicit epoch
    restored10, epoch10 = load_checkpoint(template, exp, epoch=10)
    assert epoch10 == 10
    assert int(restored10["step"]) == 7
    # missing dir -> template passthrough
    same, none = load_checkpoint(template, str(tmp_path / "nope"))
    assert none is None


def test_bounds_roundtrip(tmp_path):
    exp = str(tmp_path / "exp2")
    bounds = {"translations_min": np.array([-3, 0, -3], np.float32),
              "translations_max": np.array([3, 4, 3], np.float32)}
    save_bounds(exp, bounds)
    got = load_bounds(exp)
    np.testing.assert_array_equal(got["translations_min"], bounds["translations_min"])
    assert load_bounds(str(tmp_path / "nope")) is None


def test_stats_logger():
    StatsLogger.reset_instance()
    logger = StatsLogger.instance()
    assert StatsLogger.instance() is logger
    agg = AverageAggregator()
    agg.value = 1.0
    agg.value = 3.0
    assert agg.value == 2.0
    logger["loss.bbox"].value = 4.0
    logger.update({"loss.bbox": 6.0, "gradnorm": 1.0})
    assert logger["loss.bbox"].value == 5.0
    sink = io.StringIO()
    logger.add_output_file(sink)
    logger.print_progress(1, 2, 0.5)
    assert "loss.bbox: 5.00000" in sink.getvalue()
    logger.clear()
    assert logger["loss.bbox"]._count == 0
    StatsLogger.reset_instance()


def test_stats_logger_remove_output_file(tmp_path):
    """Two trainings in one process must not cross-write stats files: the
    singleton keeps registered sinks forever unless the CLI detaches its
    per-run file (remove_output_file) when done."""
    StatsLogger.reset_instance()
    logger = StatsLogger.instance()
    f1 = open(tmp_path / "run1.txt", "a")
    logger.add_output_file(f1)
    logger.print_progress(0, 1, 1.0)
    logger.remove_output_file(f1)
    assert f1.closed
    logger.clear()  # between-runs reset (the CLIs clear per epoch)
    f2 = open(tmp_path / "run2.txt", "a")
    logger.add_output_file(f2)
    logger.print_progress(0, 1, 2.0)
    logger.remove_output_file(f2)
    assert "2.00000" not in (tmp_path / "run1.txt").read_text()
    assert "2.00000" in (tmp_path / "run2.txt").read_text()
    StatsLogger.reset_instance()


def test_load_reference_format_config(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(
        "data:\n  dataset_type: cached_threedfront\n"
        "network:\n  type: diffusion_scene_layout_ddpm\n  point_dim: 62\n"
        "training:\n  epochs: 10\n  batch_size: 128\n"
    )
    cfg = load_config(str(p))
    assert cfg["network"]["point_dim"] == 62
    assert cfg["training"]["batch_size"] == 128


def test_trace_window(tmp_path):
    """TraceWindow captures exactly its [start, start+length) step window
    and writes a profiler trace directory; close() is idempotent and stops
    an in-flight capture when the loop ends early."""
    from diffuscene_tpu.utils import TraceWindow

    logdir = str(tmp_path / "trace")
    w = TraceWindow(logdir, start=2, length=3)
    for step in range(8):
        w.tick(step)
        jnp.zeros(8).block_until_ready()
    w.close()
    w.close()  # idempotent
    # jax.profiler writes plugins/profile/<run>/ under the logdir
    dumped = []
    for root, _dirs, files in os.walk(logdir):
        dumped += files
    assert dumped, "no trace files written"

    # early-ended loop: capture starts but the loop stops before `stop`
    logdir2 = str(tmp_path / "trace2")
    w2 = TraceWindow(logdir2, start=0, length=100)
    w2.tick(0)
    w2.close()
    dumped2 = []
    for root, _dirs, files in os.walk(logdir2):
        dumped2 += files
    assert dumped2, "early close wrote no trace files"


def test_async_checkpoint_roundtrip_and_donation_safety(tmp_path):
    """blocking=False must snapshot to host copies before returning: mutating
    (or donating) the live state right after save cannot corrupt the write."""
    from diffuscene_tpu.utils import (
        load_checkpoint, save_checkpoint, wait_for_checkpoints)

    state = {"params": {"w": jnp.arange(8.0)}, "step": jnp.zeros((), jnp.int32)}
    save_checkpoint(state, str(tmp_path), epoch=1, blocking=False)
    # clobber the source arrays immediately (what a donated train step does)
    state["params"]["w"] = state["params"]["w"] * 0 - 99.0
    wait_for_checkpoints()

    template = {"params": {"w": jnp.zeros(8)}, "step": jnp.zeros((), jnp.int32)}
    restored, epoch = load_checkpoint(template, str(tmp_path))
    assert epoch == 1
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), np.arange(8.0))


def test_checkpoint_retention(tmp_path):
    from diffuscene_tpu.utils import load_checkpoint, save_checkpoint
    from diffuscene_tpu.utils.checkpoint import latest_epoch, prune_checkpoints

    state = {"w": jnp.ones(4)}
    for e in (1, 3, 5, 7):
        save_checkpoint(state, str(tmp_path), epoch=e)
    removed = prune_checkpoints(str(tmp_path), keep_last=2)
    assert removed == [1, 3]
    assert latest_epoch(str(tmp_path)) == 7

    # keep_last threaded through save_checkpoint; protect always survives
    save_checkpoint(state, str(tmp_path), epoch=9, keep_last=1)
    assert latest_epoch(str(tmp_path)) == 9
    restored, epoch = load_checkpoint({"w": jnp.zeros(4)}, str(tmp_path))
    assert epoch == 9
    import os as _os
    names = sorted(f for f in _os.listdir(str(tmp_path)) if f.startswith("model_"))
    assert names == ["model_00009"], names
