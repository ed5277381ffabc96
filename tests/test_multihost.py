"""Multi-host (pod) data-parallel training: a REAL 2-process jax.distributed
CPU cluster (Gloo collectives, 4 virtual devices per process = one global
8-device mesh) must reproduce the single-process 8-device mesh losses.

This exercises the exact SPMD shape a TPU pod runs (main.py with
cfg.tpu.distributed_init=true): put_global assembling each host's shard of
the global batch, replicated params, the cross-process gradient psum, and
process-0-gated host writes. tests/multihost_worker.py is the per-process
entry; this driver spawns the cluster and compares.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cluster_matches_single_process(tmp_path):
    # reference: same steps + eval on this process's own 8-device mesh
    from os2d_tpu.parallel import make_mesh
    from multihost_worker import run_class_sharded_eval, run_steps

    mesh = make_mesh(8)
    ref_losses, ref_gnorms = run_steps(mesh)
    assert all(np.isfinite(ref_losses)), ref_losses
    ref_packed = run_class_sharded_eval(mesh)

    port = _free_port()
    out = tmp_path / "proc0.json"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(pid), "2", str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout)
    for p, stdout in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{stdout[-4000:]}"

    # process-0-gated write landed; non-primary did not clobber it
    assert out.exists(), outputs[0][-2000:]
    cluster = json.loads(out.read_text())

    # same math, different physical layout: fp32-tight (the psum reduction
    # order across processes may differ from single-process)
    np.testing.assert_allclose(cluster["losses"], ref_losses,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(cluster["grad_norms"], ref_gnorms,
                               rtol=1e-4, atol=1e-6)

    # class-sharded fused eval across the cluster (the _replicated readback
    # path, active only when process_count > 1) matches single-process
    np.testing.assert_allclose(
        np.asarray(cluster["eval_packed"], np.float32), ref_packed,
        rtol=1e-4, atol=1e-4)
