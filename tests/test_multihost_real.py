"""REAL multi-process DP: two jax.distributed processes (Gloo collectives),
4 virtual CPU devices each, one 8-device mesh — vs a single-process control
over the same global batch (SURVEY.md §2.5 host->device per-host feed row,
upgraded from the sliced-feed simulation in test_multihost_feed.py).

Every process materializes only its local_batch_slice and assembles the
global array with make_array_from_process_local_data; cross-replica BN and
grad pmean make the math topology-independent, so the 2x4 run must agree
with the 1x8 run to collective-reduction-order tolerance.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # subprocess tier: run with --runslow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "multihost_demo.py")
LOSS_KEYS = ("errG", "errD", "errD_real", "errD_fake")


def _launch(procs, proc_id, local_devices, port):
    return subprocess.Popen(
        [sys.executable, TOOL, "--procs", str(procs), "--id", str(proc_id),
         "--local-devices", str(local_devices),
         "--coordinator", f"localhost:{port}"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=REPO)


def _result(proc, timeout=420):
    out, err = proc.communicate(timeout=timeout)
    assert proc.returncode == 0, err[-2000:]
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def _free_port():
    # ask the kernel for an unused port (hardcoded ports collide with
    # TIME_WAIT sockets left by a crashed prior run, or unrelated listeners)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_matches_single_process():
    control = _result(_launch(1, 0, 8, _free_port()))
    port = _free_port()
    p0 = _launch(2, 0, 4, port)
    p1 = _launch(2, 1, 4, port)
    r0, r1 = _result(p0), _result(p1)
    # Replicated outputs: every process sees the same numbers.
    for k in LOSS_KEYS:
        assert r0[k] == r1[k], (k, r0, r1)
    # Topology-independence: 2x4 == 1x8 math up to reduction order.
    for k in LOSS_KEYS:
        assert abs(r0[k] - control[k]) < 5e-3, (k, r0, control)
