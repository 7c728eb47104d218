"""True multi-process (DCN-style) execution test: two OS processes, one CPU
device each, joined by jax.distributed over a localhost coordinator, running
a shard_map psum across the 2-device global mesh (SURVEY.md §5 "Distributed
communication backend" — the multihost init path was untested in round 1).

The children must start with a CLEAN backend: the parent strips the axon
sitecustomize trigger (PALLAS_AXON_POOL_IPS) and the virtual-device XLA flag
so each child sees exactly one CPU device and initialize_multihost() runs
BEFORE any backend boot (mesh.py uses jax.distributed.is_initialized() for
its idempotence check precisely so no device query happens first).
"""
import os
import subprocess
import sys

import pytest

_CHILD = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) if False else sys.argv[4])
from gpe_tpu.parallel import initialize_multihost
pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
ok = initialize_multihost(f"localhost:{port}", n, pid)
assert ok, "initialize_multihost returned False with explicit coordinator"
assert jax.process_count() == n, jax.process_count()
assert jax.device_count() == n * jax.local_device_count()
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map
mesh = Mesh(np.asarray(jax.devices()), ("data",))
@jax.jit
def f(x):
    def g(x):
        return jax.lax.psum(jnp.sum(x), "data")
    return shard_map(g, mesh=mesh, in_specs=P("data"), out_specs=P())(x)
from jax.sharding import NamedSharding
per = jax.local_device_count()
x = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), np.ones((per,), np.float32))
out = float(f(x))
assert out == float(jax.device_count()), out
print(f"OK proc={pid} devices={jax.device_count()} psum={out}", flush=True)
"""


def test_two_process_multihost_psum(tmp_path):
    # No pytest.mark.timeout: pytest-timeout is not installed (the mark was
    # a silent no-op) — the communicate(timeout=200) below is the real bound.
    child = tmp_path / "mh_child.py"
    child.write_text(_CHILD)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)          # no axon backend boot
    env["JAX_PLATFORMS"] = "cpu"
    # one local device per process: drop the conftest's 8-device flag
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    # a free port from the OS, so parallel test runs can't collide
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    procs = [subprocess.Popen(
        [sys.executable, str(child), str(i), "2", port, repo],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=repo) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=200)
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, out[-2000:]
        assert "OK proc=" in out
