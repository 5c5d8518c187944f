"""Distributed BA: mesh-sharded Schur solve must match single-device BA
on the same problem (SURVEY.md §4 distributed-test requirement)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from orb_line_slam_tpu.backend.local_ba import bundle_adjust
from orb_line_slam_tpu.parallel.sharded_ba import make_distributed_ba
from tests.test_local_ba import CAM, make_ba_problem


def _group_obs_by_shard(obs_cam, obs_lm, obs, octv, P, n_dev, o_per_shard):
    """Host-side packing: landmark-shard d gets landmarks
    [d*P/n, (d+1)*P/n) and all their observations, with obs_lm local."""
    p_per = P // n_dev
    oc = np.zeros((n_dev, o_per_shard), np.int32)
    ol = np.zeros((n_dev, o_per_shard), np.int32)
    ouv = np.zeros((n_dev, o_per_shard, 3), np.float32)
    ooct = np.zeros((n_dev, o_per_shard), np.int32)
    oval = np.zeros((n_dev, o_per_shard), bool)
    for d in range(n_dev):
        sel = (obs_lm >= d * p_per) & (obs_lm < (d + 1) * p_per)
        idx = np.nonzero(sel)[0][:o_per_shard]
        n = len(idx)
        oc[d, :n] = obs_cam[idx]
        ol[d, :n] = obs_lm[idx] - d * p_per
        ouv[d, :n] = obs[idx]
        ooct[d, :n] = octv[idx]
        oval[d, :n] = True
    return (
        oc.reshape(-1), ol.reshape(-1), ouv.reshape(-1, 3),
        ooct.reshape(-1), oval.reshape(-1),
    )


def test_sharded_ba_matches_single_device():
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest should provide 8 virtual CPU devices"
    mesh = Mesh(np.array(jax.devices()), ("dp",))

    R_gt, t_gt, pts_gt, obs_cam, obs_lm, obs, octv = make_ba_problem(C=5, P=96)
    rng = np.random.default_rng(0)
    C, P, O = 5, 96, obs.shape[0]
    pts0 = np.asarray(pts_gt) + rng.normal(0, 0.08, (P, 3)).astype(np.float32)
    fixed = np.array([True, True, False, False, False])

    # Single-device result (stage 1 only, same iteration count).
    res1 = bundle_adjust(
        R_gt, t_gt, jnp.asarray(fixed), jnp.asarray(pts0), jnp.ones(P, bool),
        obs_cam, obs_lm, obs, octv, jnp.ones(O, bool), CAM,
        iters1=8, iters2=0,
    )

    # Sharded result.
    oc, ol, ouv, ooct, oval = _group_obs_by_shard(
        np.asarray(obs_cam), np.asarray(obs_lm), np.asarray(obs),
        np.asarray(octv), P, n_dev, o_per_shard=128,
    )
    ba = make_distributed_ba(mesh, CAM, n_iters=8)
    R2, t2, pts2 = ba(
        R_gt, t_gt, jnp.asarray(fixed),
        jnp.asarray(pts0), jnp.ones(P, bool),
        jnp.asarray(oc), jnp.asarray(ol), jnp.asarray(ouv),
        jnp.asarray(ooct), jnp.asarray(oval),
    )

    # Both must converge to ground truth.
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R_gt), atol=5e-3)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t_gt), atol=3e-2)
    err = np.linalg.norm(np.asarray(pts2) - np.asarray(pts_gt), axis=-1)
    assert np.median(err) < 0.03
    # And agree with each other tightly (same math, same schedule; the
    # only difference is huber-stage flags and summation order).
    np.testing.assert_allclose(np.asarray(t2), np.asarray(res1.t), atol=2e-2)


def test_sharded_cg_gba_matches_single_device():
    """The landmark-sharded CG-Schur global adjuster must match the
    single-device matrix-free CG solver on the same problem."""
    from orb_line_slam_tpu.backend.global_ba import bundle_adjust_cg
    from orb_line_slam_tpu.parallel.sharded_ba import make_distributed_ba_cg

    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), ("dp",))

    R_gt, t_gt, pts_gt, obs_cam, obs_lm, obs, octv = make_ba_problem(C=6, P=128)
    rng = np.random.default_rng(1)
    C, P, O = 6, 128, obs.shape[0]
    pts0 = np.asarray(pts_gt) + rng.normal(0, 0.08, (P, 3)).astype(np.float32)
    fixed = np.array([True, True, False, False, False, False])

    ref = bundle_adjust_cg(
        jnp.asarray(R_gt), jnp.asarray(t_gt), jnp.asarray(fixed),
        jnp.asarray(pts0), jnp.ones(P, bool),
        jnp.asarray(obs_cam), jnp.asarray(obs_lm), jnp.asarray(obs),
        jnp.asarray(octv), jnp.ones(O, bool), CAM,
        iters1=3, iters2=0, cg_iters=36,
    )

    o_per = 1 << int(np.ceil(np.log2(max(O // n_dev * 2, 8))))
    oc, ol, ouv, ooct, oval = _group_obs_by_shard(
        np.asarray(obs_cam), np.asarray(obs_lm), np.asarray(obs),
        np.asarray(octv), P, n_dev, o_per
    )
    ba = make_distributed_ba_cg(mesh, CAM, iters1=3, iters2=0, cg_iters=36)
    R1, t1, pts1, inl, chi2 = ba(
        jnp.asarray(R_gt), jnp.asarray(t_gt), jnp.asarray(fixed),
        jnp.asarray(pts0), jnp.ones(P, bool),
        jnp.asarray(oc), jnp.asarray(ol), jnp.asarray(ouv),
        jnp.asarray(ooct), jnp.asarray(oval),
    )
    np.testing.assert_allclose(np.asarray(t1), np.asarray(ref.t), atol=2e-3)
    np.testing.assert_allclose(np.asarray(pts1), np.asarray(ref.points), atol=5e-3)
    assert np.isfinite(float(chi2))


def test_gba_routes_to_sharded_on_multidevice():
    """run_global_ba on a big-enough map must take the sharded branch
    under a multi-device runtime, and converge (pull drifted poses
    toward consistency)."""
    from orb_line_slam_tpu.config import MapConfig, OrbConfig, SlamConfig, LineConfig
    from orb_line_slam_tpu.loop.loop_closing import LoopCloser, _ShardedGBAResult
    from orb_line_slam_tpu.loop.vocabulary import Vocabulary
    from orb_line_slam_tpu.slam_map.map_store import MapStore

    rng = np.random.default_rng(2)
    F = 64
    cfg = SlamConfig(
        camera=CAM, orb=OrbConfig(n_features=F),
        lines=LineConfig(enabled=False),
        map=MapConfig(max_keyframes=16, max_points=4096),
    )
    store = MapStore(cfg.map, n_features=F)
    voc = Vocabulary.train(
        rng.integers(0, 256, (600, 32), dtype=np.uint8), k=4, depth=2
    )
    lc = LoopCloser(cfg, store, voc)

    # A small multi-view problem: GT points observed by 6 keyframes.
    pts_w = np.stack(
        [rng.uniform(-3, 3, F), rng.uniform(-2, 2, F), rng.uniform(6, 14, F)], -1
    ).astype(np.float32)

    class _F:
        pass

    ids = None
    for k in range(6):
        t_gt = np.array([0.35 * k, 0.0, 0.0], np.float32)
        t_est = t_gt + rng.normal(0, 0.02, 3).astype(np.float32) * (k > 0)
        p_cam = pts_w + t_gt
        u = CAM.fx * p_cam[:, 0] / p_cam[:, 2] + CAM.cx
        v = CAM.fy * p_cam[:, 1] / p_cam[:, 2] + CAM.cy
        fr = _F()
        fr.xy = np.stack([u, v], -1).astype(np.float32)
        fr.u_right = (u - CAM.bf / p_cam[:, 2]).astype(np.float32)
        fr.depth = p_cam[:, 2].astype(np.float32)
        fr.octave = np.zeros(F, np.int32)
        fr.angle = np.zeros(F, np.float32)
        fr.desc = rng.integers(0, 256, (F, 32), dtype=np.uint8)
        fr.valid = np.ones(F, bool)
        kf = store.add_keyframe(fr, np.eye(3, dtype=np.float32), t_est, k)
        if k == 0:
            ids = store.add_points(pts_w, fr.desc, fr.octave, kf, np.arange(F))
        else:
            store.kf_obs_lm[kf, :] = ids
    store.touch_obs()

    # Force the CG/sharded branch regardless of problem size.
    out = lc._dispatch_gba_sharded(
        store.pack_local_ba(5, max_cams=8, max_points=256, max_obs=1024,
                            all_free=True),
        len(jax.devices()), 3, 0,
    )
    assert isinstance(out, _ShardedGBAResult)
    inl = out.obs_inlier
    assert inl.sum() >= 5 * F  # most observations survive as inliers
    assert np.isfinite(out.points).all()
