"""ORB extractor integration tests: repeatability vs cv2, rotation
invariance of descriptors, matching across a synthetic view change."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from orb_line_slam_tpu.config import OrbConfig
from orb_line_slam_tpu.frontend import extract_orb
from orb_line_slam_tpu.ops import hamming_matrix

RNG = np.random.default_rng(7)


def checker_scene(h=240, w=320, n_blobs=120):
    """A textured synthetic image with corner-rich structure."""
    img = np.full((h, w), 120, dtype=np.uint8)
    rng = np.random.default_rng(3)
    for _ in range(n_blobs):
        y, x = rng.integers(10, h - 20), rng.integers(10, w - 20)
        s = rng.integers(4, 14)
        val = rng.integers(0, 255)
        img[y : y + s, x : x + s] = val
    return cv2.GaussianBlur(img, (3, 3), 0.8)


CFG = OrbConfig(n_features=512, n_levels=4)


class TestExtractOrb:
    def test_shapes_and_validity(self):
        img = checker_scene()
        f = extract_orb(jnp.asarray(img), CFG)
        assert f.xy.shape == (512, 2)
        assert f.desc.shape == (512, 32)
        n_valid = int(np.asarray(f.valid).sum())
        assert n_valid > 150  # textured scene should produce many features

    def test_keypoints_near_cv2_orb(self):
        """Repeatability golden: most cv2.ORB keypoints should have one of
        ours within a few pixels (level-0)."""
        img = checker_scene()
        orb = cv2.ORB_create(nfeatures=512, nlevels=4, fastThreshold=12)
        kps = orb.detect(img, None)
        f = extract_orb(jnp.asarray(img), CFG)
        ours = np.asarray(f.xy)[np.asarray(f.valid)]
        hits = 0
        for kp in kps:
            d = np.hypot(ours[:, 0] - kp.pt[0], ours[:, 1] - kp.pt[1])
            if d.min() < 4.0:
                hits += 1
        assert len(kps) > 50
        assert hits / len(kps) > 0.6

    def test_descriptor_matching_under_shift(self):
        """Features re-detected after a small translation should match by
        Hamming distance to their counterparts (self-consistency)."""
        img = checker_scene()
        shift = 6
        img2 = np.roll(img, shift, axis=1)
        f1 = extract_orb(jnp.asarray(img), CFG)
        f2 = extract_orb(jnp.asarray(img2), CFG)
        v1, v2 = np.asarray(f1.valid), np.asarray(f2.valid)
        d = np.array(hamming_matrix(f1.desc, f2.desc))
        d[~v1] = 999
        d[:, ~v2] = 999
        best = d.argmin(axis=1)
        xy1, xy2 = np.asarray(f1.xy), np.asarray(f2.xy)
        good = 0
        checked = 0
        for i in range(len(best)):
            if not v1[i] or d[i, best[i]] > 60:
                continue
            checked += 1
            dx = xy2[best[i], 0] - xy1[i, 0]
            dy = xy2[best[i], 1] - xy1[i, 1]
            if abs(dx - shift) < 3 and abs(dy) < 3:
                good += 1
        assert checked > 50
        assert good / checked > 0.7

    def test_rotation_invariance(self):
        """Descriptors should survive a 30-degree in-plane rotation (the
        point of steered BRIEF + IC-angle)."""
        img = checker_scene(256, 256)
        M = cv2.getRotationMatrix2D((128, 128), 30, 1.0)
        img2 = cv2.warpAffine(img, M, (256, 256), borderValue=120)
        f1 = extract_orb(jnp.asarray(img), CFG)
        f2 = extract_orb(jnp.asarray(img2), CFG)
        v1, v2 = np.asarray(f1.valid), np.asarray(f2.valid)
        d = np.array(hamming_matrix(f1.desc, f2.desc))
        d[~v1] = 999
        d[:, ~v2] = 999
        xy1 = np.asarray(f1.xy)
        xy2 = np.asarray(f2.xy)
        R = M[:, :2]
        t = M[:, 2]
        pred = xy1 @ R.T + t  # where each f1 keypoint lands in img2
        best = d.argmin(axis=1)
        good = 0
        checked = 0
        for i in range(len(best)):
            if not v1[i] or d[i, best[i]] > 64:
                continue
            inside = 20 < pred[i, 0] < 236 and 20 < pred[i, 1] < 236
            if not inside:
                continue
            checked += 1
            err = np.hypot(*(xy2[best[i]] - pred[i]))
            if err < 4.0:
                good += 1
        assert checked > 30
        assert good / checked > 0.5
