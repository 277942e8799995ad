"""Multi-host runtime exercised with real `jax.distributed` localhost
processes (SURVEY §4 item 4): two OS processes, one coordinator, global
device visibility, a cross-process allgather, and disjoint per-host data
shards."""

import socket
import subprocess
import sys
import textwrap

REPO = "/root/repo"

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from eagcn_tpu.parallel.multihost import (
        host_local_indices, initialize_multihost)

    pid = int(sys.argv[1]); port = sys.argv[2]
    info = initialize_multihost(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid)
    assert info["process_count"] == 2, info
    assert info["global_devices"] == 2 * info["local_devices"], info

    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    g = multihost_utils.process_allgather(
        jnp.array([float(info["process_index"] + 1)]))
    shard = host_local_indices(list(range(10)))
    print("RESULT", info["process_index"], info["global_devices"],
          float(g.sum()), ",".join(map(str, shard)), flush=True)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_init():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(i), str(port)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pidx, ndev, total, shard = line.split(" ", 4)
                results[int(pidx)] = (int(ndev), float(total), shard)
    assert set(results) == {0, 1}, results
    for ndev, total, _ in results.values():
        assert ndev == 4            # 2 local CPU devices per process
        assert total == 3.0         # allgather of [1.0] and [2.0]
    # disjoint round-robin shards covering all indices
    s0 = set(results[0][2].split(","))
    s1 = set(results[1][2].split(","))
    assert s0 == {"0", "2", "4", "6", "8"}
    assert s1 == {"1", "3", "5", "7", "9"}
