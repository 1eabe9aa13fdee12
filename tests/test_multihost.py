"""Multi-host (2-process) smoke: the DCN path of parallel/mesh.py, executed.

Launches two REAL OS processes, each with 4 virtual CPU devices, joined into
one 8-device global mesh via jax.distributed.initialize
(parallel/mesh.initialize_distributed); each runs an observation-sharded BA
solve whose collectives cross the process boundary (gloo transport — the CPU
stand-in for DCN). The reference has no distributed execution at all
(SURVEY.md section 2); this pins the multi-process bring-up end to end.
"""

import json
import os
import socket
import subprocess
import sys


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_ba():
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m",
                "vision_slam_frontend_tpu.parallel.multihost_smoke",
                "--coordinator", f"localhost:{port}",
                "--num_processes", "2",
                "--process_id", str(pid),
                "--local_devices", "4",
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=repo,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        ok_lines = [l for l in out.splitlines() if l.startswith("MULTIHOST_OK ")]
        assert ok_lines, f"process {pid} printed no MULTIHOST_OK:\n{out[-3000:]}"
        rec = json.loads(ok_lines[0][len("MULTIHOST_OK "):])
        assert rec["global_devices"] == 8
        assert rec["local_devices"] == 4
        assert rec["cost_final"] < rec["cost_initial"]
