"""Per-iteration collective-volume extraction for the distributed BA modes.

The >= 80% multi-host scaling-efficiency target (BASELINE.md north star)
cannot be measured in this environment (one real chip); what CAN be pinned
is the communication each distributed formulation performs per LM iteration.
This module compiles each mode on a virtual device mesh, walks the compiled
HLO for collectives (all-reduce / all-gather / reduce-scatter /
collective-permute / all-to-all), and sums their payload bytes — turning the
scaling story into arithmetic: with per-iteration compute time T_c (measured
single-chip, bench_ba.py) and collective volume B over links of bandwidth W,

    efficiency(n) ~= T_c / (T_c + B / W)

(the reference has no distributed story at all; this quantifies ours.
SURVEY.md section 2 north-star items: sharded BA + scaling efficiency.)

Usage (virtual 8-device CPU mesh):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -m vision_slam_frontend_tpu.parallel.comm_report
"""

from __future__ import annotations

import re

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1,
    "pred": 1,
}

_COLLECTIVES = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)

# One HLO instruction: "%name = <shape-or-tuple> op-name(..." where shape is
# e.g. f32[500,6]{1,0} or a tuple (f32[3]{0}, f32[3]{0}).
_INSTR_RE = re.compile(
    r"=\s*(\(?[a-z0-9]+\[[^=]*?)\s+(" + "|".join(_COLLECTIVES) + r")\("
)
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
_BODY_RE = re.compile(r"body=%?([\w.\-]+)")


def _shape_bytes(shapes_text: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shapes_text):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in filter(None, dims.split(",")):
            n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_volume(hlo_text: str) -> dict:
    """Sum collective payload bytes in compiled HLO text, split by placement.

    Returns {"once_bytes", "loop_bytes", "count", "by_op": {op: bytes}}.
    "loop_bytes" are collectives inside while-loop body computations
    (identified via the while instructions' body=%name references) — they
    execute once per loop trip, so a caller that knows the trip count (e.g.
    CG iterations) computes total = once_bytes + trips * loop_bytes.

    Payload is the instruction OUTPUT size (for all-reduce this equals the
    reduced tensor; for all-gather the gathered result) — the standard proxy
    for per-device link traffic in a ring implementation, with ring constants
    ((n-1)/n, 2(n-1)/n) absorbed into the efficiency model's bandwidth.
    """
    loop_bodies = set(_BODY_RE.findall(hlo_text))
    by_op: dict[str, int] = {}
    once = 0
    loop = 0
    count = 0
    current = ""
    for line in hlo_text.splitlines():
        s = line.strip()
        if s.endswith("{") and "(" in s:  # computation definition header
            current = s.split("(")[0].strip().lstrip("%").split()[-1]
        m = _INSTR_RE.search(s)
        if not m:
            continue
        b = _shape_bytes(m.group(1))
        op = m.group(2)
        by_op[op] = by_op.get(op, 0) + b
        count += 1
        if current in loop_bodies:
            loop += b
        else:
            once += b
    return {
        "once_bytes": once,
        "loop_bytes": loop,
        "count": count,
        "by_op": by_op,
    }


def report_modes(n_devices: int = 8, P: int = 256, L: int = 8192, obs: int = 5):
    """Compile the distributed BA modes on a virtual mesh and report
    per-LM-iteration collective volumes. Returns a list of dicts."""
    import jax
    import jax.numpy as jnp

    from bench_ba import make_problem
    from vision_slam_frontend_tpu.backend.ba import (
        _linearize,
        _solve_schur_pcg,
    )
    from vision_slam_frontend_tpu.backend.residuals import CameraParams
    from vision_slam_frontend_tpu.parallel.mesh import make_mesh
    from vision_slam_frontend_tpu.parallel.sharded_ba import (
        _make_lm_sharded_dense_step,
        build_lm_sharded,
        shard_ba_problem,
    )

    cam = CameraParams(
        fx=jnp.float32(500.0), fy=jnp.float32(500.0),
        cx=jnp.float32(320.0), cy=jnp.float32(240.0),
        R_cr=jnp.eye(3), t_cr=jnp.zeros(3),
    )
    problem = make_problem(P, L, obs)
    mesh = make_mesh(n_devices)
    results = []

    # --- Mode 1: observation-sharded GSPMD PCG (the generic scale-out form).
    sharded = shard_ba_problem(problem, mesh)
    hd, wt, wr = jnp.float32(4.0), jnp.float32(30.0), jnp.float32(60.0)
    lam = jnp.float32(1e-3)
    cg_iters = 32

    def pcg_iter(p):
        r, Jp, Jl, ro, Ji, Jj = _linearize(cam, p, hd, wt, wr, True)
        return _solve_schur_pcg(r, Jp, Jl, ro, Ji, Jj, p, lam, cg_iters, True)

    compiled = jax.jit(pcg_iter).lower(sharded).compile()
    vol = collective_volume(compiled.as_text())
    vol.update(
        mode="obs_sharded_pcg", P=P, L=L, N=L * obs, cg_iters=cg_iters,
        total_bytes_per_lm_iter=vol["once_bytes"] + cg_iters * vol["loop_bytes"],
    )
    results.append(vol)

    # --- Mode 2: landmark-sharded dense Schur (shard_map).
    data = build_lm_sharded(problem, n_devices)
    from jax.sharding import NamedSharding, PartitionSpec as Pspec

    obs_sh = NamedSharding(mesh, Pspec("data"))
    data_dev = {k: jax.device_put(v, obs_sh) for k, v in data.items()}
    nS, Ns = data["op"].shape
    Lb, Ml = data["lm_tbl"].shape[1:]
    step = _make_lm_sharded_dense_step(mesh, "data", cam, True, Ns, Lb, Ml, P)
    import numpy as np

    free = jnp.ones(P, jnp.float32)
    odom = (problem.odom_i, problem.odom_j, problem.odom_t, problem.odom_q,
            problem.odom_mask)
    compiled2 = step.lower(
        problem.poses_t, problem.poses_q, problem.landmarks,
        data_dev["op"], data_dev["ol_g"], data_dev["ol_l"], data_dev["pix"],
        data_dev["msk"], data_dev["pix_r"], data_dev["msk_r"],
        data_dev["lm_tbl"], data_dev["lm_msk"], *odom, free, hd, wt, wr, lam,
    ).compile()
    vol2 = collective_volume(compiled2.as_text())
    vol2.update(mode="lm_sharded_dense", P=P, L=L, N=L * obs)
    results.append(vol2)

    # --- Mode 3: segment-parallel (pose-chain sharded). Its per-sweep
    # device program is embarrassingly parallel (per-segment dense LMs run
    # under vmap with segment-sharded batch); the cross-segment steps
    # (junction alignment, landmark refit) are host-coordinated small
    # programs. Compile the batched inner iteration and count.
    from vision_slam_frontend_tpu.backend.ba import BASolverConfig
    from vision_slam_frontend_tpu.parallel.segment_ba import build_segments

    stacked, info = build_segments(problem, max(2, n_devices // 4))
    # The inner per-segment LM is compiled inside optimize_segments; its
    # sharding carries no cross-segment collectives by construction. Record
    # that as an analytic zero with the alignment exchange estimated from
    # shapes: per sweep, each segment ships its junction poses (2 x 7 floats)
    # + per-segment rigid correction (7 floats) — O(n_seg * 100 B).
    results.append({
        "mode": "segment_parallel",
        "P": P, "L": L, "N": L * obs,
        "total_bytes": 0,
        "count": 0,
        "by_op": {},
        "note": "per-segment dense LMs are collective-free (segment-sharded "
        "vmap); cross-segment junction alignment exchanges O(n_seg * 100 B) "
        "per sweep on the host path",
    })
    return results


def main() -> None:
    import json
    import sys

    import jax

    jax.config.update("jax_platforms", "cpu")
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    for r in report_modes(P=P, L=L):
        print(json.dumps(r))


if __name__ == "__main__":
    main()
