"""Multi-host scaffolding test (BASELINE config #5, VERDICT r3 #6).

Launches TWO separate OS processes, each with 4 virtual CPU devices,
joined into one 8-device process-spanning mesh via
``jax.distributed.initialize`` (orb_line_slam_tpu.parallel.multihost).
The landmark-sharded CG-on-Schur global bundle adjuster runs across the
process boundary (its psum-reduced camera system now rides the
inter-process channel — the DCN analog) and must agree with the
single-process dense solve.

Real >=2-host TPU hardware cannot run in this environment; this proves
the code path end to end so only the hardware is missing.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multihost_gba_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_gba_agrees_with_single_process(tmp_path):
    out = tmp_path / "result.txt"
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    # The worker sets its own JAX_PLATFORMS/XLA_FLAGS; scrub the test
    # session's single-process settings so they don't leak in.  The
    # axon sitecustomize (PYTHONPATH) initializes the PJRT backend at
    # interpreter start, which locks process_count at 1 BEFORE
    # jax.distributed.initialize can run — the workers must not see it.
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, "2", str(pid), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout.decode(errors="replace"))
        assert p.returncode == 0, f"worker failed:\n{logs[-1][-3000:]}"
    text = out.read_text().strip()
    assert text.startswith("OK"), f"disagreement: {text}\n{logs[0][-2000:]}"
    assert "ndev=8 nproc=2" in text
