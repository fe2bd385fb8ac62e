"""Two-process distributed bring-up (VERDICT r1 next-#7a): exercise
``initialize_distributed`` + a cross-process DP QAT step end-to-end on two
local CPU processes (4 virtual devices each → one 8-device global mesh).

The reference has no distributed layer at all; this pins the multi-host
bring-up path the framework claims (parallel/mesh.py:initialize_distributed,
docs/scaling.md) without real multi-host hardware.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port



def test_two_process_dp_train_step():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)  # force CPU (CLAUDE.md)
        env.pop("PYTHONPATH", None)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    assert {o["pid"] for o in outs} == {0, 1}
    assert all(o["pcount"] == 2 for o in outs)
    # Replicated state ⇒ both processes observe identical losses and qparams.
    assert outs[0]["losses"] == outs[1]["losses"]
    assert outs[0]["qp0"] == outs[1]["qp0"]
    # and training actually trains
    assert outs[0]["losses"][-1] < outs[0]["losses"][0]
    # TP serving ACROSS processes (model axis spans both hosts) reproduces
    # the unsharded packed forward on every process
    for o in outs:
        assert o["tp_max_err"] < 1e-5, o
    assert outs[0]["tp_out0"] == outs[1]["tp_out0"]
