"""Kernel-level tests: Hamming ops, FAST stencil, grid top-K, image ops."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_line_slam_tpu.ops import (
    fast_score_map,
    hamming_matrix,
    hamming_pairwise,
    knn2,
    nms3x3,
    pack_bits,
    select_topk_grid,
    unpack_bits,
)

RNG = np.random.default_rng(1)


class TestHamming:
    def test_pack_unpack_roundtrip(self):
        desc = jnp.asarray(RNG.integers(0, 256, size=(16, 32), dtype=np.uint8))
        np.testing.assert_array_equal(pack_bits(unpack_bits(desc)), desc)

    def test_matrix_vs_numpy(self):
        a = RNG.integers(0, 256, size=(33, 32), dtype=np.uint8)
        b = RNG.integers(0, 256, size=(47, 32), dtype=np.uint8)
        d = np.asarray(hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
        # numpy oracle
        abits = np.unpackbits(a, axis=1, bitorder="little")
        bbits = np.unpackbits(b, axis=1, bitorder="little")
        ref = (abits[:, None, :] != bbits[None, :, :]).sum(-1)
        np.testing.assert_array_equal(d, ref)

    def test_pairwise_matches_matrix_diag(self):
        a = jnp.asarray(RNG.integers(0, 256, size=(20, 32), dtype=np.uint8))
        b = jnp.asarray(RNG.integers(0, 256, size=(20, 32), dtype=np.uint8))
        dm = hamming_matrix(a, b)
        dp = hamming_pairwise(a, b)
        np.testing.assert_array_equal(np.diag(np.asarray(dm)), np.asarray(dp))

    def test_knn2(self):
        dist = jnp.asarray([[5, 1, 3], [9, 9, 0]], dtype=jnp.int32)
        idx, d1, d2 = knn2(dist)
        np.testing.assert_array_equal(idx, [1, 2])
        np.testing.assert_array_equal(d1, [1, 0])
        np.testing.assert_array_equal(d2, [3, 9])

    def test_knn2_masked(self):
        dist = jnp.asarray([[5, 1, 3]], dtype=jnp.int32)
        idx, d1, d2 = knn2(dist, jnp.asarray([True, False, True]))
        assert int(idx[0]) == 2 and int(d1[0]) == 3


class TestFast:
    def test_corner_detected(self):
        img = np.full((32, 32), 50.0, dtype=np.float32)
        img[:16, :16] = 200.0  # bright square corner at (15,15)-ish
        score = np.asarray(fast_score_map(jnp.asarray(img)))
        assert score.max() > 20.0
        ys, xs = np.nonzero(score > 20.0)
        # corners of the square (at the boundary) should respond
        assert np.any((np.abs(ys - 15) <= 2) & (np.abs(xs - 15) <= 2))

    def test_flat_image_no_corners(self):
        img = jnp.full((32, 32), 100.0)
        score = np.asarray(fast_score_map(img))
        assert score.max() <= 0.0

    def test_nms_single_peak(self):
        score = np.zeros((16, 16), dtype=np.float32)
        score[5, 5] = 10.0
        score[5, 6] = 10.0  # tie plateau
        score[9, 9] = 8.0
        out = np.asarray(nms3x3(jnp.asarray(score)))
        assert (out > 0).sum() == 2  # one of the plateau + the 8.0 peak
        assert out[9, 9] == 8.0

    def test_matches_cv2_fast_locations(self):
        """Golden: our FAST corners should mostly coincide with cv2's."""
        import cv2

        img = RNG.integers(0, 255, size=(120, 160), dtype=np.uint8)
        img = cv2.GaussianBlur(img, (5, 5), 1.5)
        th = 20
        kps = cv2.FastFeatureDetector_create(
            threshold=th, nonmaxSuppression=True,
            type=cv2.FAST_FEATURE_DETECTOR_TYPE_9_16,
        ).detect(img)
        ours = np.asarray(fast_score_map(jnp.asarray(img.astype(np.float32))))
        ours_mask = ours > th
        hits = sum(
            1
            for kp in kps
            if ours_mask[
                max(0, int(kp.pt[1]) - 1) : int(kp.pt[1]) + 2,
                max(0, int(kp.pt[0]) - 1) : int(kp.pt[0]) + 2,
            ].any()
        )
        assert len(kps) > 20
        assert hits / len(kps) > 0.9  # >90% of cv2 corners found by our stencil


class TestTopkGrid:
    def test_selects_best_per_cell(self):
        score = np.zeros((64, 64), dtype=np.float32)
        score[3, 3] = 5.0
        score[5, 10] = 9.0  # same 16px cell as (3,3)
        score[40, 40] = 7.0
        xy, resp, valid = select_topk_grid(
            jnp.asarray(score), cell=16, k_per_cell=1, n_total=4, min_score=1.0
        )
        got = {(int(x), int(y)) for (x, y), v in zip(np.asarray(xy), np.asarray(valid)) if v}
        assert got == {(10, 5), (40, 40)}

    def test_budget_and_mask(self):
        score = np.zeros((64, 64), dtype=np.float32)
        for i in range(8):
            score[i * 8 + 2, i * 8 + 2] = float(i + 1)
        xy, resp, valid = select_topk_grid(
            jnp.asarray(score), cell=8, k_per_cell=2, n_total=4, min_score=0.5
        )
        assert int(np.asarray(valid).sum()) == 4
        assert np.asarray(resp)[np.asarray(valid)].min() >= 5.0  # top-4 kept
