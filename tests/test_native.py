"""Native component tests: ORBvoc parser (vs Python fallback), the
prefetching stereo loader, and the OpenCV LBD oracle agreement check."""

import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np
import pytest

from orb_line_slam_tpu.loop.vocabulary import Vocabulary
from orb_line_slam_tpu.utils.native import (
    NativeStereoLoader,
    get_native_lib,
    parse_orbvoc_native,
)

NATIVE_DIR = Path(__file__).resolve().parents[1] / "native"


def make_fake_orbvoc(path, k=3, depth=2, seed=0):
    """Write a small DBoW2-format vocabulary text file."""
    rng = np.random.default_rng(seed)
    lines = [f"{k} {depth} 0 0"]
    # depth-1 internal level (children of root), then leaves.
    node_id = 0
    internal = []
    for i in range(k):
        node_id += 1
        internal.append(node_id)
        d = rng.integers(0, 256, 32)
        lines.append("0 0 " + " ".join(str(x) for x in d) + " 0")
    for p in internal:
        for j in range(k):
            d = rng.integers(0, 256, 32)
            w = rng.uniform(0.1, 1.0)
            lines.append(f"{p} 1 " + " ".join(str(x) for x in d) + f" {w:.6f}")
    Path(path).write_text("\n".join(lines) + "\n")


class TestVocabParser:
    def test_native_matches_python(self):
        if get_native_lib() is None:
            pytest.skip("native lib unavailable")
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "voc.txt")
            make_fake_orbvoc(p)
            parsed = parse_orbvoc_native(p)
            assert parsed is not None
            k, L, parents, leafs, descs, weights = parsed
            assert k == 3 and L == 2
            assert len(parents) == 3 + 9
            voc = Vocabulary.parse_orbvoc_txt(p)
            assert voc.n_words == 9
            # transform works end-to-end
            dd = np.random.default_rng(1).integers(0, 256, (16, 32), dtype=np.uint8)
            words = voc.transform_words(dd, np.ones(16, bool))
            assert ((words >= 0) & (words < 9)).all()


class TestNativeLoader:
    def test_prefetch_loader(self):
        if get_native_lib() is None:
            pytest.skip("native lib unavailable")
        import cv2

        rng = np.random.default_rng(0)
        with tempfile.TemporaryDirectory() as d:
            lefts, rights, gts = [], [], []
            for i in range(6):
                img_l = rng.integers(0, 255, (64, 96), dtype=np.uint8)
                img_r = rng.integers(0, 255, (64, 96), dtype=np.uint8)
                lp = os.path.join(d, f"l{i}.png")
                rp = os.path.join(d, f"r{i}.png")
                cv2.imwrite(lp, img_l)
                cv2.imwrite(rp, img_r)
                lefts.append(lp)
                rights.append(rp)
                gts.append((img_l, img_r))
            loader = NativeStereoLoader(lefts, rights, 64, 96, n_workers=2, ring=4)
            for i in range(6):
                l, r = loader.get(i)
                np.testing.assert_array_equal(l, gts[i][0])
                np.testing.assert_array_equal(r, gts[i][1])
            loader.close()


class TestLBDOracle:
    def test_matching_agreement_with_opencv(self):
        """Our LBD and OpenCV's must mostly agree on which line pairs
        match between two shifted views."""
        oracle = NATIVE_DIR / "build" / "lbd_oracle"
        if not oracle.exists():
            rc = subprocess.run(["make"], cwd=NATIVE_DIR, capture_output=True)
            if not oracle.exists():
                pytest.skip("lbd_oracle not buildable")
        import cv2
        import jax.numpy as jnp

        from tests.test_lines import draw_scene
        from orb_line_slam_tpu.ops.lbd import lbd_descriptors
        from orb_line_slam_tpu.ops.lines import detect_lines, merge_collinear

        img1, _ = draw_scene(seed=6)
        img2 = np.roll(img1, 7, axis=1)

        def oracle_lines(img):
            with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
                cv2.imwrite(f.name, img)
                out = subprocess.run(
                    [str(oracle), f.name, "25"], capture_output=True, text=True
                ).stdout
            os.unlink(f.name)
            segs, descs = [], []
            for line in out.strip().splitlines():
                vals = line.split()
                segs.append([float(v) for v in vals[:4]])
                descs.append([int(v) for v in vals[4:]])
            return np.asarray(segs), np.asarray(descs, np.uint8)

        s1, d1 = oracle_lines(img1)
        s2, d2 = oracle_lines(img2)
        if len(s1) < 3 or len(s2) < 3:
            pytest.skip("oracle found too few lines")

        # OpenCV LBD matching (hamming brute force)
        def best_match(da, db):
            bits_a = np.unpackbits(da, axis=1)
            bits_b = np.unpackbits(db, axis=1)
            dist = (bits_a[:, None] != bits_b[None, :]).sum(-1)
            return dist.argmin(1)

        cv_match = best_match(d1, d2)

        # Our LBD on the oracle's own segments (same geometry!)
        def ours(img, segs):
            p0 = jnp.asarray(segs[:, :2].astype(np.float32))
            p1 = jnp.asarray(segs[:, 2:].astype(np.float32))
            return np.asarray(
                lbd_descriptors(
                    jnp.asarray(img.astype(np.float32)), p0, p1,
                    jnp.ones(len(segs), bool),
                )
            )

        o1 = ours(img1, s1)
        o2 = ours(img2, s2)
        our_match = best_match(o1, o2)

        agree = (cv_match == our_match).mean()
        assert agree > 0.6, f"LBD matching agreement {agree:.2f}"
