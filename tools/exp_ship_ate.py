"""Bisect the shipping-config ATE gap (pinned 0.26 vs ship 0.75)."""
import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run(depth, async_map, gba_async, label, seed=5):
    from orb_line_slam_tpu.config import (
        LineConfig, MapConfig, OrbConfig, SlamConfig,
    )
    from orb_line_slam_tpu.data.synthetic import (
        SyntheticScene, loop_circuit_trajectory,
    )
    from orb_line_slam_tpu.eval.trajectory import ate_rmse
    from orb_line_slam_tpu.geometry.camera import CameraIntrinsics
    from orb_line_slam_tpu.pipeline.system import System

    vcam = CameraIntrinsics(fx=320.0, fy=320.0, cx=320.0, cy=160.0, bf=160.0,
                            width=640, height=320)
    cfg = SlamConfig(
        camera=vcam, orb=OrbConfig(n_features=1000, n_levels=4),
        lines=LineConfig(enabled=True, n_lines=64),
        map=MapConfig(max_keyframes=128, max_points=16384, max_lines=1024,
                      local_window=8, local_points=4096),
    )
    poses = loop_circuit_trajectory(170, radius=8.0, laps=1.12)
    scene = SyntheticScene(vcam, n_points=1600, seed=seed,
                           extent=((-24, 40), (-4, 4), (-32, 32)))
    scene.noise_sigma = 6.0
    sysm = System(cfg, use_loop_closing=True, async_loop=False)
    sysm.tracker.async_mapping = async_map
    sysm.tracker.pipeline_depth = depth
    sysm.gba_async = gba_async
    for i, (R, t) in enumerate(poses):
        l, r = scene.render_stereo(R, t)
        sysm.track_stereo(l, r, timestamp=0.1 * i)
    sysm.shutdown()
    est = np.stack(
        [-R.T @ t for (_, _, R, t, _) in sysm.tracker.final_trajectory()]
    )
    gt = np.stack([-R.T @ t for (R, t) in poses])
    ate = float(ate_rmse(est, gt, align=True))
    print(f"{label:<40} ate={ate:.4f} loops={sysm.n_loops_closed}")
    return ate


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "a"):
        run(0, False, False, "pinned (d0 sync gba-sync)")
    if which in ("all", "b"):
        run(1, False, False, "d1 only")
    if which in ("all", "c"):
        run(0, True, False, "async-map only")
    if which in ("all", "d"):
        run(1, True, False, "d1 + async-map")
    if which in ("all", "e"):
        run(1, True, True, "ship (d1 + async-map + gba-async)")
