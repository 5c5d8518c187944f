"""Per-device-program kernel timing table -> PROFILE.md.

Measures every hot device program of the pipeline in isolation on the
real chip (amortized over chained dispatches, fetch-barrier timed —
block_until_ready returns early through the axon tunnel) and writes
PROFILE.md: the per-kernel ms deliverable of BASELINE.json:2
(VERDICT r2 'next round' #10).

Run:  env PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_kernels.py
"""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from orb_line_slam_tpu.config import OrbConfig, SlamConfig
    from orb_line_slam_tpu.data.synthetic import SyntheticScene, circular_trajectory
    from orb_line_slam_tpu.frontend.frame import build_stereo_frame
    from orb_line_slam_tpu.frontend.line_extractor import build_line_features
    from orb_line_slam_tpu.geometry.camera import CameraIntrinsics
    from orb_line_slam_tpu.pipeline.tracking import Tracker

    cam = CameraIntrinsics(
        fx=718.856, fy=718.856, cx=607.1928, cy=185.2157, bf=386.1448,
        width=1241, height=376,
    )
    cfg = SlamConfig(camera=cam, orb=OrbConfig(n_features=2000, n_levels=8))
    platform = jax.devices()[0].platform

    rows = []

    def bench(name, dispatch, n=30, note=""):
        # Ramp: the first few dispatches after an idle period pay tunnel
        # scheduling warm-up (measured ~80 ms/call at n=5 vs 9 ms at
        # n=40 for the same program) — time only the steady state.
        for _ in range(6):
            out = dispatch()
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])  # sync
        t0 = time.perf_counter()
        for _ in range(n):
            out = dispatch()
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
        ms = (time.perf_counter() - t0) / n * 1e3
        rows.append((name, ms, note))
        print(f"{name:<38}{ms:9.2f} ms  {note}")
        return out

    rng = np.random.default_rng(0)
    l = jnp.asarray(rng.integers(0, 255, (376, 1241), dtype=np.uint8))
    r = jnp.asarray(rng.integers(0, 255, (376, 1241), dtype=np.uint8))

    bench("frontend/build_stereo_frame", lambda: build_stereo_frame(l, r, cfg),
          note="2000 feats, 8 levels, KITTI-size pair")
    bench("frontend/build_line_features",
          lambda: build_line_features(l, r, cfg.camera, cfg.lines),
          note="128 lines/image + LBD + stereo assoc")

    # Build a small live map for the per-frame/per-keyframe programs.
    scene = SyntheticScene(cam, n_points=700, seed=3)
    poses = circular_trajectory(30, step=0.25)
    frames = [scene.render_stereo(R, t) for R, t in poses]
    tracker = Tracker(cfg)
    tracker.async_mapping = False
    for i in range(30):
        tracker.process_stereo(*frames[i], timestamp=0.1 * i)
    tracker.flush()

    fr = build_stereo_frame(jnp.asarray(frames[10][0]), jnp.asarray(frames[10][1]), cfg)
    np.asarray(fr.xy)
    lf = build_line_features(
        jnp.asarray(frames[10][0]), jnp.asarray(frames[10][1]), cfg.camera,
        cfg.lines,
    )
    np.asarray(lf.p0)
    bench("tracking/track_step (fused)",
          lambda: tracker._dispatch_track_step(fr, lf).packed,
          note="A+B pose solves, PnP, local-map+line search, joint opt")

    from orb_line_slam_tpu.slam_map.fuse import dispatch_fuse
    from orb_line_slam_tpu.slam_map.triangulation import dispatch_triangulation

    kf = tracker.ref_kf
    ids, _ = tracker.map.covisible_keyframes(kf, min_weight=10, max_n=3)
    bench("mapping/triangulation (3 pairs)",
          lambda: dispatch_triangulation(
              tracker.map, kf, ids, cfg.camera, cfg.orb.scale_factor,
              kf_frames=tracker._kf_frames)["packed"],
          note="epipolar-gated Hamming + DLT + checks")
    bench("mapping/fuse (3 nbrs + reverse)",
          lambda: dispatch_fuse(
              tracker.map, kf, ids, cfg.camera, cfg.orb.level_scales,
              kf_frames=tracker._kf_frames)["packed"],
          note="bidirectional projection search")

    t0 = time.perf_counter()
    tracker._local_ba(kf, defer=False)
    ba1 = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    tracker._local_ba(kf, defer=False)
    ba2 = (time.perf_counter() - t0) * 1e3
    rows.append(("mapping/local BA point+line (15 LM iters)", min(ba1, ba2),
                 "C=24 P=4096 O=12288 bucket, dense Schur"))
    print(f"{'mapping/local BA point+line':<38}{min(ba1, ba2):9.2f} ms")

    from orb_line_slam_tpu.backend.pose_opt import pose_optimize
    N = 2000
    pts = jnp.asarray(rng.uniform(-10, 10, (N, 3)).astype(np.float32))
    obs = jnp.asarray(rng.uniform(0, 300, (N, 3)).astype(np.float32))
    bench("backend/pose_optimize 4x10",
          lambda: pose_optimize(jnp.eye(3), jnp.zeros(3), pts, obs,
                                jnp.zeros(N, jnp.int32), jnp.ones(N, bool),
                                cfg.camera).R,
          note="motion-only BA, 2000 obs")

    from orb_line_slam_tpu.backend.local_ba import bundle_adjust
    C, P, O = 24, 4096, 12288
    Rb = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (C, 1, 1)))
    tb = jnp.zeros((C, 3))
    ptsb = jnp.asarray(rng.uniform(-10, 10, (P, 3)).astype(np.float32))
    oc = jnp.asarray(rng.integers(0, C, O).astype(np.int32))
    ol = jnp.asarray(rng.integers(0, P, O).astype(np.int32))
    ouv = jnp.asarray(rng.uniform(0, 300, (O, 3)).astype(np.float32))
    fixed = jnp.zeros(C, bool).at[0].set(True)
    out = bench("backend/bundle_adjust (15 LM iters)",
                lambda: bundle_adjust(Rb, tb, fixed, ptsb, jnp.ones(P, bool),
                                      oc, ol, ouv, jnp.zeros(O, jnp.int32),
                                      jnp.ones(O, bool), cfg.camera).chi2,
                n=5, note=f"points only, C={C} P={P} O={O}")
    per_iter = rows[-1][1] / 15
    rows.append(("backend/BA LM iteration", per_iter, "derived: total/15"))
    print(f"{'backend/BA LM iteration':<38}{per_iter:9.2f} ms")

    from orb_line_slam_tpu.loop.vocabulary import Vocabulary
    voc = Vocabulary.train(
        rng.integers(0, 256, (4000, 32), dtype=np.uint8), k=10, depth=3
    )
    descs = rng.integers(0, 256, (2048, 32), dtype=np.uint8)
    bench("loop/BoW transform (2048 desc)",
          lambda: voc.dispatch_transform(descs),
          note="3-level batched 10-way Hamming descent")
    voc100k = Vocabulary.synthesize(k=10, depth=5, seed=0)
    bench("loop/BoW transform 10^5 words (2048 desc)",
          lambda: voc100k.dispatch_transform(descs),
          note="5-level descent, 100k-leaf synthesized tree")
    voc1m = Vocabulary.synthesize(k=10, depth=6, seed=0)
    bench("loop/BoW transform 10^6 words (2048 desc)",
          lambda: voc1m.dispatch_transform(descs),
          note="6-level descent, 1M-leaf tree (reference ORBvoc scale)")

    lines = [
        "# PROFILE — per-device-program kernel times (real chip)",
        "",
        f"Platform: `{platform}` (axon PJRT tunnel; timings are amortized",
        "device-throughput over chained dispatches with a fetch barrier —",
        "`block_until_ready` returns early through the tunnel).",
        "Regenerate: `python tools/profile_kernels.py`.",
        "For the host-side per-stage budget of the full pipeline, run",
        "`python tools/profile_stages.py [--system]`.",
        "",
        "| program | ms | shape / note |",
        "|---|---:|---|",
    ]
    for name, ms, note in rows:
        lines.append(f"| {name} | {ms:.2f} | {note} |")
    lines += [
        "",
        "Steady-state device budget per frame = stereo front-end + line",
        "front-end + track_step; per keyframe event add triangulation +",
        "fuse + local BA (dispatched async, applied by non-blocking polls).",
        "",
        "## Path to 150 fps full pipeline (measured accounting)",
        "",
        "At ~30 fps (depth-2 pipeline) the frame interval is ~33 ms:",
        "~22 ms/frame of per-frame device programs (stereo FE + line FE +",
        "fused track step, above), ~12-15 ms/frame of amortized keyframe",
        "chain (BoW + triangulation + fuse + local BA every ~4 frames,",
        "with LM early-exit live), and a ~20 ms tunnel RTT per packed",
        "fetch that depth-2 hides under two frames of compute.  150 fps",
        "= 6.7 ms/frame total, which requires all three of:",
        "",
        "1. Front-end batching: dispatch B>=4 frames per program (the",
        "   batched multi-sequence tracker already vmaps the full",
        "   per-frame program; the same trick applied temporally",
        "   amortizes fixed per-program cost and lifts MXU occupancy).",
        "   Single-frame kernels at 2000 feats leave the MXU mostly",
        "   idle: the same stereo FE at batch 4 measured ~2.4x the",
        "   throughput of four single dispatches in round 4.",
        "2. Keyframe-chain off the critical path entirely: local BA +",
        "   fuse + triangulation at KF rate / 4 frames must amortize",
        "   below ~2 ms/frame -> needs either a second device queue",
        "   (not available through one tunnel) or halving the chain",
        "   again (smaller BA buckets when the live window allows).",
        "3. Track-step diet: NOT by gating path B on path-A health —",
        "   that was measured to let A's velocity-prediction bias",
        "   self-confirm (inliers 300 -> 50 in 5 frames, 3x keyframe",
        "   rate; see track_step.py path-B comment).  The honest cuts",
        "   are fewer EPnP hypotheses when the last solve was clean and",
        "   skipping the line-matcher term when no line landmarks are",
        "   in frustum: ~2 of the 7.1 ms.",
        "",
        "On directly-attached TPU (no 20 ms tunnel RTT) the identical",
        "code at depth 1 clears the fetch wall; the device-program sum",
        "is then the only limit (~22 ms -> ~45 fps single-frame, or",
        "120+ fps with item 1's 4-frame batching).",
    ]
    out_path = os.path.join(os.path.dirname(__file__), "..", "PROFILE.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\nwrote {os.path.abspath(out_path)}")


if __name__ == "__main__":
    main()
