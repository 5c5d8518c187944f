"""Line subsystem tests: detection on drawn segments (incl. cv2 LSD
cross-check), LBD stability, stereo endpoint depths, matching."""

import cv2
import jax.numpy as jnp
import numpy as np

from orb_line_slam_tpu.config import LineConfig
from orb_line_slam_tpu.frontend.line_extractor import build_line_features
from orb_line_slam_tpu.geometry.camera import CameraIntrinsics
from orb_line_slam_tpu.matching.line_matcher import match_lines
from orb_line_slam_tpu.ops.lbd import lbd_descriptors
from orb_line_slam_tpu.ops.lines import detect_lines, merge_collinear

CFG = LineConfig(n_lines=64)


def draw_scene(h=240, w=320, segs=None, seed=0, noise=3):
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 120, np.uint8)
    img = np.clip(
        img.astype(np.int32)
        + rng.integers(-noise, noise + 1, (h, w)), 0, 255
    ).astype(np.uint8)
    if segs is None:
        segs = [
            ((40, 40), (240, 60)),
            ((60, 200), (260, 180)),
            ((150, 30), (160, 210)),
            ((30, 120), (290, 140)),
        ]
    for (a, b) in segs:
        cv2.line(img, a, b, 220, 2, cv2.LINE_AA)
    return cv2.GaussianBlur(img, (3, 3), 0.8), segs


def seg_distance(p0, p1, a, b):
    """Max distance of detected endpoints to the GT infinite line + angle."""
    a = np.array(a, float)
    b = np.array(b, float)
    d = b - a
    n = np.array([-d[1], d[0]]) / np.linalg.norm(d)
    return max(abs(np.dot(p0 - a, n)), abs(np.dot(p1 - a, n)))


class TestDetect:
    def test_recovers_drawn_segments(self):
        img, segs = draw_scene()
        out = detect_lines(jnp.asarray(img), n_lines=64)
        out = merge_collinear(out)
        p0 = np.asarray(out.p0)[np.asarray(out.valid)]
        p1 = np.asarray(out.p1)[np.asarray(out.valid)]
        ln = np.asarray(out.length)[np.asarray(out.valid)]
        assert len(p0) >= 4, f"only {len(p0)} lines"
        found = 0
        for (a, b) in segs:
            gt_len = np.hypot(b[0] - a[0], b[1] - a[1])
            for i in range(len(p0)):
                if seg_distance(p0[i], p1[i], a, b) < 3.0 and ln[i] > 0.5 * gt_len:
                    found += 1
                    break
        assert found >= 3, f"recovered {found}/4 segments"

    def test_flat_image_no_lines(self):
        img = np.full((120, 160), 100, np.uint8)
        out = detect_lines(jnp.asarray(img), n_lines=32)
        assert int(np.asarray(out.valid).sum()) == 0

    def test_against_cv2_lsd(self):
        """Long cv2-LSD segments should have a counterpart of ours."""
        img, _ = draw_scene(seed=2)
        lsd = cv2.createLineSegmentDetector()
        cv_lines = np.asarray(lsd.detect(img)[0]).reshape(-1, 4)
        out = merge_collinear(detect_lines(jnp.asarray(img), n_lines=64))
        p0 = np.asarray(out.p0)[np.asarray(out.valid)]
        p1 = np.asarray(out.p1)[np.asarray(out.valid)]
        long_cv = [
            l for l in cv_lines
            if np.hypot(l[2] - l[0], l[3] - l[1]) > 40
        ]
        assert len(long_cv) >= 3
        hits = 0
        for (x0, y0, x1, y1) in long_cv:
            for i in range(len(p0)):
                if (
                    seg_distance(p0[i], p1[i], (x0, y0), (x1, y1)) < 4.0
                ):
                    hits += 1
                    break
        assert hits / len(long_cv) > 0.6


class TestLBDMatching:
    def test_descriptors_stable_under_shift(self):
        img, segs = draw_scene(seed=1)
        img2 = np.roll(img, 5, axis=1)
        from orb_line_slam_tpu.frontend.line_extractor import extract_line_features

        l1 = extract_line_features(jnp.asarray(img), CFG)
        l2 = extract_line_features(jnp.asarray(img2), CFG)
        d1 = lbd_descriptors(jnp.asarray(img, jnp.float32), l1.p0, l1.p1, l1.valid)
        d2 = lbd_descriptors(jnp.asarray(img2, jnp.float32), l2.p0, l2.p1, l2.valid)

        class LF:
            pass

        a, b = LF(), LF()
        a.desc, a.angle, a.p0, a.p1, a.length, a.valid = d1, l1.angle, l1.p0, l1.p1, l1.length, l1.valid
        b.desc, b.angle, b.p0, b.p1, b.length, b.valid = d2, l2.angle, l2.p0, l2.p1, l2.length, l2.valid
        m = match_lines(a, b)
        mask = np.asarray(m.mask)
        assert mask.sum() >= 3
        # matched midpoints should differ by the shift
        mid_a = np.asarray(0.5 * (l1.p0 + l1.p1))
        mid_b = np.asarray(0.5 * (l2.p0 + l2.p1))
        idx = np.asarray(m.idx)
        good = 0
        for i in np.nonzero(mask)[0]:
            # for near-horizontal lines the midpoint shifts by 5px in x
            dx = mid_b[idx[i], 0] - mid_a[i, 0]
            if abs(dx - 5) < 6:
                good += 1
        assert good >= mask.sum() * 0.6


class TestStereoLines:
    def test_endpoint_depths(self):
        cam = CameraIntrinsics(
            fx=300.0, fy=300.0, cx=160.0, cy=120.0, bf=60.0, width=320, height=240
        )
        depth_gt = 6.0
        disp = cam.bf / depth_gt  # 10 px
        # Steep segments only: near-horizontal lines are (correctly)
        # rejected by the inclination gate.
        segs_l = [((70, 40), (140, 200)), ((230, 190), (180, 50)), ((120, 30), (130, 200))]
        segs_r = [
            ((int(a[0] - disp), a[1]), (int(b[0] - disp), b[1])) for a, b in segs_l
        ]
        imL, _ = draw_scene(240, 320, segs_l, seed=4)
        imR, _ = draw_scene(240, 320, segs_r, seed=4)
        lf = build_line_features(jnp.asarray(imL), jnp.asarray(imR), cam, CFG)
        d0 = np.asarray(lf.depth0)
        d1 = np.asarray(lf.depth1)
        ok = (d0 > 0) & (d1 > 0)
        assert ok.sum() >= 2, f"only {ok.sum()} stereo lines"
        err = np.abs(np.concatenate([d0[ok], d1[ok]]) - depth_gt)
        assert np.median(err) < 0.5, f"median depth err {np.median(err):.2f}"
