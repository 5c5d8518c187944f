"""Batched multi-sequence TRACKING (BASELINE config #4, VERDICT r3 #5).

Two different synthetic sequences tracked by ONE vmapped per-frame
device program (front-end + fused track step with batched carries and
per-sequence device map mirrors); each sequence's trajectory must match
the single-sequence Tracker run on the same frames.
"""

import numpy as np
import pytest

from orb_line_slam_tpu.config import LineConfig, MapConfig, OrbConfig, SlamConfig
from orb_line_slam_tpu.data.synthetic import SyntheticScene, circular_trajectory
from orb_line_slam_tpu.geometry.camera import CameraIntrinsics
from orb_line_slam_tpu.parallel.multi_sequence import MultiSequenceTracker
from orb_line_slam_tpu.pipeline.tracking import Tracker

CAM = CameraIntrinsics(
    fx=400.0, fy=400.0, cx=320.0, cy=160.0, bf=160.0, width=640, height=320
)
CFG = SlamConfig(
    camera=CAM,
    orb=OrbConfig(n_features=512, n_levels=4),
    lines=LineConfig(enabled=False),
    map=MapConfig(max_keyframes=64, max_points=8192, local_window=8,
                  local_points=2048),
)
N_FRAMES = 16


def _make_sequences():
    seqs = []
    for seed in (3, 9):
        scene = SyntheticScene(
            CAM, n_points=500, seed=seed, extent=((-14, 14), (-6, 6), (6, 60))
        )
        poses = circular_trajectory(N_FRAMES, step=0.3)
        seqs.append(([scene.render_stereo(R, t) for R, t in poses], poses))
    return seqs


@pytest.mark.slow
def test_batched_tracking_matches_single_sequence():
    seqs = _make_sequences()
    B = len(seqs)

    mst = MultiSequenceTracker(CFG, B, full_slam=False, host_threads=False)
    for t in mst.trackers:
        t.async_mapping = False
        t.pipeline_depth = 0
    n_batched = 0
    for i in range(N_FRAMES):
        ready_before = mst._ready()
        mst.process_stereo(
            [seqs[b][0][i][0] for b in range(B)],
            [seqs[b][0][i][1] for b in range(B)],
            [0.1 * i] * B,
        )
        n_batched += ready_before
    for t in mst.trackers:
        t.flush()
    assert n_batched >= N_FRAMES // 2, (
        f"batched steady state never engaged ({n_batched} batched frames)"
    )

    for b in range(B):
        ref = Tracker(CFG)
        ref.async_mapping = False
        ref.pipeline_depth = 0
        for i, (l, r) in enumerate(seqs[b][0]):
            ref.process_stereo(l, r, timestamp=0.1 * i)
        ref.flush()
        est = np.stack(
            [-R.T @ t for (_, _, R, t, _) in mst.trackers[b].final_trajectory()]
        )
        est_ref = np.stack(
            [-R.T @ t for (_, _, R, t, _) in ref.final_trajectory()]
        )
        gt = np.stack([-R.T @ t for (R, t) in seqs[b][1]])
        err_b = np.linalg.norm(est - gt, axis=1).max()
        err_r = np.linalg.norm(est_ref - gt, axis=1).max()
        assert mst.trackers[b].state == "OK"
        # The batched program is numerically the same math; both runs
        # must track with comparable accuracy on their own sequence.
        assert err_b < 0.2, f"seq {b}: batched err {err_b:.3f}"
        assert abs(err_b - err_r) < 0.15, (
            f"seq {b}: batched {err_b:.3f} vs single {err_r:.3f}"
        )


@pytest.mark.slow
def test_batched_full_slam_closes_loops():
    """BASELINE config #4 is FULL SLAM per sequence: each batched
    sequence owns a KeyFrameDatabase + LoopCloser, and a revisiting
    circuit must close its loop inside the batched run (VERDICT r4
    'next round' #6), with lines enabled and host bookkeeping on the
    thread pool."""
    from orb_line_slam_tpu.data.synthetic import loop_circuit_trajectory

    n_frames = 150
    vcam = CameraIntrinsics(
        fx=320.0, fy=320.0, cx=320.0, cy=160.0, bf=160.0,
        width=640, height=320,
    )
    cfg = SlamConfig(
        camera=vcam,
        orb=OrbConfig(n_features=1000, n_levels=4),
        lines=LineConfig(enabled=True, n_lines=64),
        map=MapConfig(max_keyframes=128, max_points=16384, max_lines=1024,
                      local_window=8, local_points=4096),
    )
    poses = loop_circuit_trajectory(n_frames, radius=8.0, laps=1.12)
    scene = SyntheticScene(
        vcam, n_points=1600, seed=5, extent=((-24, 40), (-4, 4), (-32, 32))
    )
    scene.noise_sigma = 6.0
    frames = [scene.render_stereo(R, t) for R, t in poses]

    B = 2
    mst = MultiSequenceTracker(cfg, B, full_slam=True)
    assert mst.systems is not None
    n_batched = 0
    for i in range(n_frames):
        ready = mst._ready()
        mst.process_stereo(
            [frames[i][0]] * B, [frames[i][1]] * B, [0.1 * i] * B
        )
        n_batched += ready
    mst.shutdown()
    assert n_batched >= n_frames // 2, f"batched only {n_batched}"
    # Every sequence ran the full loop-closing machinery.
    for s in mst.systems:
        assert s.loop_closer is not None, "no LoopCloser created"
    assert mst.n_loops_closed >= 1, (
        "no sequence closed its loop in the batched full-SLAM run"
    )
    from orb_line_slam_tpu.eval.trajectory import ate_rmse

    gt = np.stack([-R.T @ t for (R, t) in poses])
    for b, tr in enumerate(mst.trackers):
        est = np.stack(
            [-R.T @ t for (_, _, R, t, _) in tr.final_trajectory()]
        )
        ate = float(ate_rmse(est, gt, align=True))
        assert ate < 1.0, f"seq {b} ATE {ate:.3f}"
