"""Multi-host helpers under single-host semantics (process_count == 1)."""
import numpy as np

from diffuscene_tpu.parallel import (
    host_local_slice, initialize, shard_indices_for_host,
)


def test_initialize_single_host():
    pid, pcount = initialize()
    assert pid == 0 and pcount >= 1


def test_host_local_slice():
    s = host_local_slice(32)
    assert (s.start, s.stop) == (0, 32)


def test_shard_indices_for_host():
    idx = np.arange(10)
    got = shard_indices_for_host(idx)
    np.testing.assert_array_equal(got, idx)  # single host keeps everything
