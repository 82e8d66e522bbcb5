"""Multi-host loopback test: 2 processes x 4 virtual CPU devices.

SURVEY.md section 4 prescribes this as the substitute for real multi-node
testing: spawn two JAX processes joined through jax.distributed.initialize
into one 8-device pod, run the full sharded train step + eval through the
multi-host data plumbing (per-process BatchIterator slices, global_batch
assembly), and assert losses / updated params / eval ranks match the
single-process 8-device run of the identical computation.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_pod_matches_single_process(tmp_path):
    port = _free_port()
    out = str(tmp_path / "worker0.json")
    env = {**os.environ, "PYTHONPATH": ROOT}
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(pid), "2", str(port), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=540)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    with open(out) as f:
        multi = json.load(f)
    assert multi["n_devices"] == 8

    # single-process oracle: same computation on this process's 8 devices
    from tests import multihost_worker
    losses, checksum, ranks = multihost_worker.run_experiment(
        n_data=4, n_model=2)

    np.testing.assert_allclose(multi["losses"], losses, rtol=2e-5)
    np.testing.assert_allclose(multi["checksum"], checksum, rtol=2e-5)
    assert multi["ranks"] == ranks
