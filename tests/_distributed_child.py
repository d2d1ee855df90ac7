"""Child process for the two-process jax.distributed smoke test.

Usage: python tests/_distributed_child.py <coordinator> <num_procs> <pid>
Prints one line: OK <process_index> <process_count> <global_devices> <psum>
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diffuscene_tpu.parallel.distributed import (  # noqa: E402
    global_batch_from_host_local, host_local_slice, initialize,
    shard_indices_for_host)


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    pidx, pcount = initialize(coordinator_address=coord,
                              num_processes=nproc, process_id=pid)
    assert (pidx, pcount) == (pid, nproc), (pidx, pcount)
    devs = jax.devices()
    assert len(devs) == 2 * nproc, devs  # 2 virtual CPU devices per process
    assert len(jax.local_devices()) == 2

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(devs), ("data",))
    # each host contributes its slice of the global batch
    global_batch = 8
    sl = host_local_slice(global_batch)
    assert sl == slice(pid * 4, pid * 4 + 4), sl
    full = np.arange(global_batch, dtype=np.float32)[:, None]
    garr = global_batch_from_host_local(full[sl], mesh)
    assert garr.shape == (global_batch, 1)

    # cross-process collective: global sum via jit over the global mesh
    @jax.jit
    def total(x):
        return x.sum()

    s = jax.device_get(total(garr))
    assert float(s) == float(full.sum()), s

    idx = shard_indices_for_host(np.arange(11))
    assert len(idx) == 5 and (idx % nproc == pid).all(), idx

    print(f"OK {pidx} {pcount} {len(devs)} {float(s)}", flush=True)


if __name__ == "__main__":
    main()
