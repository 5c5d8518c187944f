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
