"""Loop-closing component tests: vocabulary transform/scoring, keyframe
database recall, Horn Sim3 RANSAC, pose-graph drift correction."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_line_slam_tpu.backend.pose_graph import optimize_pose_graph
from orb_line_slam_tpu.backend.sim3_solver import horn_alignment, solve_sim3_ransac
from orb_line_slam_tpu.geometry.camera import CameraIntrinsics
from orb_line_slam_tpu.geometry.se3 import so3_exp
from orb_line_slam_tpu.geometry.sim3 import sim3_compose, sim3_exp, sim3_inverse
from orb_line_slam_tpu.loop.vocabulary import Vocabulary
from orb_line_slam_tpu.slam_map.keyframe_db import KeyFrameDatabase

RNG = np.random.default_rng(21)


def make_voc(n_train=8000, k=8, depth=4):
    descs = RNG.integers(0, 256, (n_train, 32), dtype=np.uint8)
    return Vocabulary.train(descs, k=k, depth=depth, seed=1)


class TestVocabulary:
    def test_transform_deterministic_and_complete(self):
        voc = make_voc()
        d = RNG.integers(0, 256, (128, 32), dtype=np.uint8)
        w1 = voc.transform_words(d, np.ones(128, bool))
        w2 = voc.transform_words(d, np.ones(128, bool))
        np.testing.assert_array_equal(w1, w2)
        assert (w1 >= 0).all()
        assert (w1 < voc.n_words).all()

    def test_similar_images_score_higher(self):
        voc = make_voc()
        base = RNG.integers(0, 256, (200, 32), dtype=np.uint8)
        # "same place": flip a couple of bits per descriptor
        noisy = base.copy()
        flips = RNG.integers(0, 32, (200, 2))
        for i in range(200):
            noisy[i, flips[i, 0]] ^= 1
            noisy[i, flips[i, 1]] ^= 4
        other = RNG.integers(0, 256, (200, 32), dtype=np.uint8)
        v = np.ones(200, bool)
        a = voc.bow_vector(base, v)
        b = voc.bow_vector(noisy, v)
        c = voc.bow_vector(other, v)
        s_same = Vocabulary.score_l1(*a, *b)
        s_diff = Vocabulary.score_l1(*a, *c)
        assert s_same > 2.5 * s_diff, (s_same, s_diff)
        assert 0.0 <= s_diff <= 1.0 + 1e-6
        assert Vocabulary.score_l1(*a, *a) > 0.999


class TestKeyFrameDatabase:
    def test_loop_candidate_recall(self):
        voc = make_voc()
        v = np.ones(150, bool)
        kfs = {}
        for k in range(10):
            kfs[k] = RNG.integers(0, 256, (150, 32), dtype=np.uint8)
        # KF 9 revisits KF 2's place.
        kfs[9] = kfs[2].copy()
        flip = RNG.integers(0, 32, 150)
        for i in range(150):
            kfs[9][i, flip[i]] ^= 2
        db = KeyFrameDatabase(voc)
        for k in range(10):
            db.add(k, kfs[k], v)
        min_score = 0.01
        cands = db.detect_loop_candidates(9, min_score, covisible={8, 7})
        assert 2 in cands, f"candidates {cands}"

    def test_relocalization_candidates(self):
        voc = make_voc()
        v = np.ones(150, bool)
        db = KeyFrameDatabase(voc)
        descs = {}
        for k in range(6):
            descs[k] = RNG.integers(0, 256, (150, 32), dtype=np.uint8)
            db.add(k, descs[k], v)
        cands = db.detect_relocalization_candidates(descs[3], v)
        assert cands[0] == 3


class TestSim3:
    def test_horn_exact(self):
        p2 = jnp.asarray(RNG.normal(size=(10, 3)).astype(np.float32))
        R_gt = so3_exp(jnp.asarray([0.2, -0.1, 0.3]))
        s_gt = 1.4
        t_gt = jnp.asarray([0.5, -1.0, 2.0])
        p1 = s_gt * p2 @ R_gt.T + t_gt
        s, R, t = horn_alignment(p1, p2, fix_scale=False)
        np.testing.assert_allclose(float(s), s_gt, atol=1e-4)
        np.testing.assert_allclose(R, R_gt, atol=1e-4)
        np.testing.assert_allclose(t, t_gt, atol=1e-4)

    def test_ransac_with_outliers(self):
        cam = CameraIntrinsics(fx=400.0, fy=400.0, cx=320.0, cy=240.0, bf=80.0,
                               width=640, height=480)
        N = 60
        p2 = np.stack(
            [RNG.uniform(-3, 3, N), RNG.uniform(-2, 2, N), RNG.uniform(4, 12, N)], -1
        ).astype(np.float32)
        R_gt = np.asarray(so3_exp(jnp.asarray([0.05, 0.3, -0.05])))
        t_gt = np.array([1.0, 0.2, -0.5], np.float32)
        p1 = p2 @ R_gt.T + t_gt
        # corrupt 30% of matches
        n_out = N // 3
        p1[:n_out] += RNG.uniform(1, 3, (n_out, 3))
        s, R, t, inl, count = solve_sim3_ransac(
            jnp.asarray(p1), jnp.asarray(p2), jnp.ones(N, bool),
            jax.random.PRNGKey(0), cam, cam,
            jnp.ones(N), jnp.ones(N), fix_scale=True, n_hyps=256,
        )
        assert int(count) >= 0.9 * (N - n_out)
        np.testing.assert_allclose(np.asarray(R), R_gt, atol=5e-3)
        np.testing.assert_allclose(np.asarray(t), t_gt, atol=5e-2)
        assert np.asarray(inl)[:n_out].mean() < 0.2


class TestPoseGraph:
    def test_loop_drift_correction(self):
        """Chain of K poses with accumulated drift; a loop edge between
        last and first must spread the correction over the chain."""
        K = 20
        # Ground truth: circle-ish translations, identity-ish rotations.
        s_gt = np.ones(K, np.float32)
        R_gt = np.zeros((K, 3, 3), np.float32)
        t_gt = np.zeros((K, 3), np.float32)
        for k in range(K):
            R_gt[k] = np.asarray(so3_exp(jnp.asarray([0.0, 0.05 * k, 0.0])))
            t_gt[k] = [0.5 * k, 0.0, 0.01 * k * k]

        # Odometry edges j = i+1 with EXACT measurements.
        edges_i = np.arange(K - 1, dtype=np.int32)
        edges_j = edges_i + 1
        es, eR, et = [], [], []
        for i in range(K - 1):
            si, Ri, ti = sim3_inverse(
                jnp.asarray(1.0), jnp.asarray(R_gt[i]), jnp.asarray(t_gt[i])
            )
            sm, Rm, tm = sim3_compose(
                jnp.asarray(1.0), jnp.asarray(R_gt[i + 1]), jnp.asarray(t_gt[i + 1]),
                si, Ri, ti,
            )
            es.append(float(sm)); eR.append(np.asarray(Rm)); et.append(np.asarray(tm))
        # Loop edge K-1 -> 0 exact.
        sK, RK, tK = sim3_inverse(
            jnp.asarray(1.0), jnp.asarray(R_gt[K - 1]), jnp.asarray(t_gt[K - 1])
        )
        sm, Rm, tm = sim3_compose(
            jnp.asarray(1.0), jnp.asarray(R_gt[0]), jnp.asarray(t_gt[0]), sK, RK, tK
        )
        edges_i = np.append(edges_i, K - 1).astype(np.int32)
        edges_j = np.append(edges_j, 0).astype(np.int32)
        es.append(float(sm)); eR.append(np.asarray(Rm)); et.append(np.asarray(tm))

        # Drifted initialization: add growing error to later poses.
        rng = np.random.default_rng(5)
        R0 = R_gt.copy()
        t0 = t_gt.copy()
        for k in range(1, K):
            drift = 0.03 * k
            R0[k] = np.asarray(
                so3_exp(jnp.asarray([0.0, 0.05 * k + 0.01 * k * 0.2, 0.0]))
            )
            t0[k] = t_gt[k] + [drift, 0.3 * drift, -0.2 * drift]

        fixed = np.zeros(K, bool)
        fixed[0] = True
        s, R, t = optimize_pose_graph(
            jnp.asarray(s_gt), jnp.asarray(R0), jnp.asarray(t0),
            jnp.ones(K, bool), jnp.asarray(fixed),
            jnp.asarray(edges_i), jnp.asarray(edges_j),
            jnp.asarray(np.array(es, np.float32)), jnp.asarray(np.stack(eR)),
            jnp.asarray(np.stack(et)),
            jnp.ones(len(es), bool), jnp.ones(len(es), jnp.float32),
            n_iters=25,
        )
        err0 = np.linalg.norm(t0 - t_gt, axis=-1).max()
        err1 = np.linalg.norm(np.asarray(t) - t_gt, axis=-1).max()
        assert err1 < 0.05 * err0, f"pose graph barely helped: {err0:.3f}->{err1:.3f}"
        np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-3)


class TestOptimizeSim3:
    """g2o OptimizeSim3 equivalent: bidirectional-reprojection GN over
    the Sim3 tangent (backend/sim3_opt.py)."""

    def _problem(self, s_gt, n=80, noise=0.3, n_out=10):
        from orb_line_slam_tpu.geometry.camera import project

        cam = CameraIntrinsics(fx=400.0, fy=400.0, cx=320.0, cy=240.0,
                               bf=80.0, width=640, height=480)
        p2 = np.stack(
            [RNG.uniform(-3, 3, n), RNG.uniform(-2, 2, n), RNG.uniform(4, 12, n)],
            -1,
        ).astype(np.float32)
        R_gt = np.asarray(so3_exp(jnp.asarray([0.05, 0.25, -0.04])))
        t_gt = np.array([0.8, 0.1, -0.4], np.float32)
        p1 = (s_gt * p2 @ R_gt.T + t_gt).astype(np.float32)
        obs1 = np.array(project(cam, jnp.asarray(p1)))
        obs2 = np.array(project(cam, jnp.asarray(p2)))
        # corrupt some observations (outliers the chi2 gate must drop)
        obs1[:n_out] += RNG.uniform(20, 60, (n_out, 2)).astype(np.float32)
        return cam, p1, p2, obs1, obs2, R_gt, t_gt

    def test_recovers_scale_mono(self):
        from orb_line_slam_tpu.backend.sim3_opt import optimize_sim3

        s_gt = 1.35
        cam, p1, p2, obs1, obs2, R_gt, t_gt = self._problem(s_gt)
        n = len(p1)
        # perturbed initial guess
        dR = np.asarray(so3_exp(jnp.asarray([0.02, -0.03, 0.01])))
        res = optimize_sim3(
            jnp.float32(1.2), jnp.asarray(dR @ R_gt), jnp.asarray(t_gt + 0.1),
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(obs1),
            jnp.asarray(obs2), jnp.ones(n), jnp.ones(n),
            jnp.ones(n, bool), cam, cam, fix_scale=False,
        )
        assert int(res.n_inliers) >= n - 10 - 5
        np.testing.assert_allclose(float(res.s), s_gt, atol=2e-2)
        np.testing.assert_allclose(np.asarray(res.R), R_gt, atol=5e-3)
        # outlier rows must be gated out
        assert np.asarray(res.inliers)[:10].sum() <= 2

    def test_fix_scale_stays_pinned(self):
        from orb_line_slam_tpu.backend.sim3_opt import optimize_sim3

        cam, p1, p2, obs1, obs2, R_gt, t_gt = self._problem(1.0)
        n = len(p1)
        dR = np.asarray(so3_exp(jnp.asarray([0.03, 0.01, -0.02])))
        res = optimize_sim3(
            jnp.float32(1.0), jnp.asarray(dR @ R_gt), jnp.asarray(t_gt - 0.05),
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(obs1),
            jnp.asarray(obs2), jnp.ones(n), jnp.ones(n),
            jnp.ones(n, bool), cam, cam, fix_scale=True,
        )
        np.testing.assert_allclose(float(res.s), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(res.R), R_gt, atol=5e-3)
        np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=5e-2)

    def test_search_by_sim3_mutual(self):
        from orb_line_slam_tpu.matching.point_matcher import search_by_sim3_dir

        cam = CameraIntrinsics(fx=400.0, fy=400.0, cx=320.0, cy=240.0,
                               bf=80.0, width=640, height=480)
        from orb_line_slam_tpu.geometry.camera import project

        n = 64
        pts = np.stack(
            [RNG.uniform(-2, 2, n), RNG.uniform(-1.5, 1.5, n),
             RNG.uniform(4, 10, n)], -1,
        ).astype(np.float32)
        uv = np.asarray(project(cam, jnp.asarray(pts)))
        desc = RNG.integers(0, 256, (n, 32), dtype=np.uint8)
        m = search_by_sim3_dir(
            jnp.asarray(pts), jnp.asarray(desc), jnp.ones(n, bool),
            jnp.asarray(uv), jnp.asarray(desc),
            jnp.zeros(n, jnp.int32), jnp.ones(n, bool),
            cam, (1.0, 1.2, 1.44), radius=7.5,
        )
        # identical descriptors at the projected locations: identity match
        assert bool(m.mask.all())
        np.testing.assert_array_equal(np.asarray(m.idx), np.arange(n))
