"""Multi-HOST dryrun: two local processes form one jax.distributed mesh
(VERDICT r1 next #8).

The reference has no multi-process anything (SURVEY.md §5: the comm
"backend" is rayon's in-process thread pool); our scale story is a
device mesh spanning hosts.  This test exercises the real
``jax.distributed.initialize`` path — two CPU processes x 4 virtual
devices = one 8-device global mesh — and runs the sharded build's
shard_map wave steps plus the all_gather query merge across the
process boundary.

The workers run with a stripped environment (no axon sitecustomize —
CLAUDE.md: replacing PYTHONPATH keeps the TPU tunnel out of
subprocesses) and communicate over a localhost port.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import numpy as np

pid = int(sys.argv[1]); port = sys.argv[2]
import jax
jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                           process_id=pid)
from instant_distance_tpu.config import Config
from instant_distance_tpu.parallel.mesh import default_mesh
from instant_distance_tpu.parallel.sharded import ShardedHnsw

mesh = default_mesh()
assert len(mesh.devices.ravel()) == 8, mesh
rng = np.random.default_rng(5)
pts = rng.random((256, 8), dtype=np.float32)
cfg = Config(seed=5, ef_search=16, ef_construction=16, wave_size=32)
idx = ShardedHnsw.build(pts, cfg, mesh=mesh)
d, g = idx.search_batch(pts[:8], k=4)
ok = float((np.asarray(g)[:, 0] == np.arange(8)).mean())
assert ok >= 0.75, f"self-recall {ok}"
print(f"worker {pid}: ok {ok}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(900)
def test_two_process_distributed_mesh(tmp_path):
    port = _free_port()
    env = {
        "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
        "HOME": os.environ.get("HOME", "/root"),
        # no axon sitecustomize: repo only (workers must be CPU-only)
        "PYTHONPATH": "/root/repo",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache",
        # the persistent-cache WRITE crash (CLAUDE.md) is contained by
        # never enabling writes in workers: reads only happen implicitly
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "3600",
    }
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=840)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"worker {pid}: ok" in out
