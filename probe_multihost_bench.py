"""Measured multi-process scaling point (round-4 verdict item 4).

Runs the observation-sharded PCG LM iteration at a load-bearing shape
(default P=128, L=50k, N=250k) twice with the SAME total device count:

  A. 2 processes x 4 virtual CPU devices (collectives cross the process
     boundary over gloo — the CPU stand-in for DCN);
  B. 1 process x 8 virtual CPU devices (same compiled program, in-process
     transport).

The per-iteration difference is the measured cross-process collective+sync
cost that anchors the analytic model's t_comm (parallel/comm_report.py);
both runs also report the HLO-extracted collective bytes/counts so the
measured point and the model line up on the same numbers.

Usage: python probe_multihost_bench.py [L] [P] [iters] [cg_iters]
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def run_config(num_processes: int, local_devices: int, L: int, P: int, iters: int, cg: int = 32):
    repo = os.path.dirname(os.path.abspath(__file__))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    port = _free_port()
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m",
                "vision_slam_frontend_tpu.parallel.multihost_smoke",
                "--coordinator", f"localhost:{port}",
                "--num_processes", str(num_processes),
                "--process_id", str(pid),
                "--local_devices", str(local_devices),
                "--bench_iters", str(iters),
                "--landmarks", str(L),
                "--poses", str(P),
                "--cg_iters", str(cg),
            ],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo,
        )
        for pid in range(num_processes)
    ]
    outs = [p.communicate(timeout=1800)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
    recs = []
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MULTIHOST_BENCH "):
                recs.append(json.loads(line[len("MULTIHOST_BENCH "):]))
    assert recs, "no MULTIHOST_BENCH lines:\n" + outs[0][-2000:]
    return recs


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    # cg is the second-measured-point lever (round-4 verdict item 5): cg=32
    # is bandwidth-weighted (most collectives live in the CG loop), cg=8
    # shifts the mix toward the once-per-iteration + per-collective latency
    # terms — two points that move ONE term of the alpha/W model apart.
    cg = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    two = run_config(2, 4, L, P, iters, cg)
    one = run_config(1, 8, L, P, iters, cg)
    t2 = max(r["sec_per_lm_iter"] for r in two)  # slowest process gates
    t1 = one[0]["sec_per_lm_iter"]
    print(json.dumps({
        "shape": {"P": P, "L": L, "N": two[0]["N"], "cg_iters": two[0]["cg_iters"]},
        "collective_bytes_per_iter": two[0]["collective_bytes_per_iter"],
        "collective_count_per_iter": two[0]["collective_count_per_iter"],
        "sec_per_iter_2proc_x4dev": t2,
        "sec_per_iter_1proc_x8dev": t1,
        "cross_process_overhead_s": round(t2 - t1, 4),
        "overhead_frac": round((t2 - t1) / t2, 4) if t2 > 0 else None,
    }, indent=None))


if __name__ == "__main__":
    main()
