"""Vocabulary at scale: >=10^4-word training, DBoW2 text round-trip
through both parser paths, and loop-detection precision/recall on a
revisit sequence (VERDICT r2 'next round' #7)."""

import numpy as np
import pytest

from orb_line_slam_tpu.loop.vocabulary import Vocabulary
from orb_line_slam_tpu.slam_map.keyframe_db import KeyFrameDatabase


def _place_descriptors(rng, n_places, n_desc, flip_bits=0):
    """Per-place descriptor banks; revisits flip `flip_bits` random bits
    per descriptor (viewpoint/illumination noise analog)."""
    base = rng.integers(0, 256, (n_places, n_desc, 32), dtype=np.uint8)

    def noisy(p):
        d = base[p].copy()
        if flip_bits:
            for _ in range(flip_bits):
                i = rng.integers(0, n_desc, n_desc)
                b = rng.integers(0, 256, n_desc).astype(np.uint8)
                d[np.arange(n_desc), rng.integers(0, 32, n_desc)] ^= (
                    1 << rng.integers(0, 8, n_desc)
                ).astype(np.uint8)
        return d

    return base, noisy


@pytest.mark.slow
def test_train_10k_words_and_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    descs = rng.integers(0, 256, (30000, 32), dtype=np.uint8)
    voc = Vocabulary.train(descs, k=10, depth=4, seed=0)
    assert voc.n_words >= 8000, f"only {voc.n_words} words"

    # Round-trip through the DBoW2 text format, Python fallback path.
    p = tmp_path / "voc.txt"
    voc.save_orbvoc_txt(p)
    from orb_line_slam_tpu.utils import native as native_mod

    orig = native_mod.parse_orbvoc_native
    try:
        native_mod.parse_orbvoc_native = lambda path: None  # force Python
        voc_py = Vocabulary.parse_orbvoc_txt(p)
    finally:
        native_mod.parse_orbvoc_native = orig
    assert voc_py.n_words == voc.n_words
    np.testing.assert_array_equal(voc_py.node_desc, voc.node_desc)

    # Native mmap parser path (when the shared library is built).
    parsed = orig(p)
    if parsed is not None:
        voc_nat = Vocabulary._from_node_list(*parsed)
        np.testing.assert_array_equal(voc_nat.node_desc, voc.node_desc)
        np.testing.assert_allclose(
            voc_nat.word_weight, voc.word_weight, rtol=1e-5
        )

    # Same descriptors must land in the same words through all copies.
    q = descs[:256]
    v = np.ones(256, bool)
    w0 = voc.transform_words(q, v)
    w1 = voc_py.transform_words(q, v)
    agree = float((w0 == w1).mean())
    assert agree == 1.0, f"word agreement {agree}"


@pytest.mark.slow
def test_loop_detection_precision_recall():
    """Revisit sequence: places 0..N-1 visited twice; the database must
    recover the first visit when queried at the second with noisy
    descriptors, and not fire on unrelated places."""
    rng = np.random.default_rng(1)
    n_places, n_desc = 24, 220
    base, noisy = _place_descriptors(rng, n_places, n_desc, flip_bits=1)

    voc = Vocabulary.train(
        base.reshape(-1, 32)[:20000], k=10, depth=3, seed=1
    )
    db = KeyFrameDatabase(voc)
    valid = np.ones(n_desc, bool)
    for p in range(n_places):
        db.add(p, base[p], valid)

    hits, truths, n_cands = 0, 0, 0
    for p in range(n_places):
        ids, w = voc.bow_vector(noisy(p), valid)
        # Query as LoopCloser._detect does (shared-word count +
        # relative-score gates).  The revisit's covisible set contains
        # only second-visit keyframes (not in the database), so the
        # exclusion set is just the query itself.
        db.bow[10_000] = (ids, w)  # transient query entry
        cands = db.detect_loop_candidates(10_000, 0.01, {10_000})
        del db.bow[10_000]
        truths += 1
        n_cands += len(cands)
        if p in cands:
            hits += 1
    recall = hits / truths
    precision = hits / max(n_cands, 1)
    assert recall >= 0.8, f"loop recall {recall:.2f}"
    assert precision >= 0.5, f"loop precision {precision:.2f}"


@pytest.mark.slow
def test_synthesized_100k_word_vocabulary(tmp_path):
    """Reference-scale vocabulary (10^5 leaves; the real ORBvoc.txt has
    ~10^6): synthesize the full tree, round-trip it through the DBoW2
    text format + native parser, verify the batched device descent
    against a host reference descent, and check loop recall at scale
    (VERDICT r3 'next round' #8)."""
    voc = Vocabulary.synthesize(k=10, depth=5, seed=0)
    assert voc.n_words == 100_000

    rng = np.random.default_rng(1)
    descs = rng.integers(0, 256, (256, 32), dtype=np.uint8)
    words = voc.transform_words(descs, np.ones(256, bool))

    # Host reference descent for a sample of descriptors.
    def host_descend(d):
        node = 0
        for _ in range(voc.depth):
            ch = voc.children[node]
            ch = ch[ch >= 0]
            dist = [
                bin(int.from_bytes(bytes(voc.node_desc[c] ^ d), "big")).count("1")
                for c in ch
            ]
            node = int(ch[int(np.argmin(dist))])
        return int(voc.word_id[node])

    for i in range(0, 256, 16):
        assert int(words[i]) == host_descend(descs[i])

    # Text round-trip through the native mmap parser when built.
    from orb_line_slam_tpu.utils.native import parse_orbvoc_native

    p = tmp_path / "voc100k.txt"
    voc.save_orbvoc_txt(p)
    parsed = parse_orbvoc_native(p)
    if parsed is not None:
        voc2 = Vocabulary._from_node_list(*parsed)
        assert voc2.n_words == voc.n_words
        w2 = voc2.transform_words(descs, np.ones(256, bool))
        np.testing.assert_array_equal(np.asarray(w2), np.asarray(words))

    # Loop recall at scale: 40 places, revisits must rank first.
    n_places, n_desc = 40, 256
    base = rng.integers(0, 256, (n_places, n_desc, 32), dtype=np.uint8)
    db = KeyFrameDatabase(voc)
    for pl in range(n_places):
        w = voc.transform_words(base[pl], np.ones(n_desc, bool))
        db.add_words(pl, w, np.ones(n_desc, bool))
    hits = 0
    for pl in range(n_places):
        revisit = base[pl].copy()
        flip = rng.integers(0, n_desc, n_desc // 4)
        revisit[flip, rng.integers(0, 32, len(flip))] ^= (
            1 << rng.integers(0, 8, len(flip))
        ).astype(np.uint8)
        w = voc.transform_words(revisit, np.ones(n_desc, bool))
        ids, wts = Vocabulary.bow_from_words(
            w, np.ones(n_desc, bool), voc.word_weight
        )
        scores = [
            (Vocabulary.score_l1(*db.bow[pl2], ids, wts), pl2)
            for pl2 in range(n_places)
        ]
        best = max(scores)[1]
        hits += best == pl
    assert hits >= int(0.9 * n_places), f"recall {hits}/{n_places}"


@pytest.mark.slow
def test_million_word_vocabulary(tmp_path):
    """The reference's production scale: 10^6 leaves (~1.11M nodes,
    ~145 MB as ORBvoc.txt).  Synthesize the full k=10 depth=6 tree,
    round-trip the text through the native parser (measuring parse
    time), verify descent agreement, and check place recall with
    CORRELATED (archetype-perturbed, not i.i.d.) descriptors — the
    aliasing-prone regime PARITY.md called out (VERDICT r4 'next
    round' #7)."""
    import time as _time

    voc = Vocabulary.synthesize(k=10, depth=6, seed=0)
    assert voc.n_words == 1_000_000

    rng = np.random.default_rng(2)
    descs = rng.integers(0, 256, (2048, 32), dtype=np.uint8)
    t0 = _time.perf_counter()
    words = voc.transform_words(descs, np.ones(2048, bool))
    t_transform = _time.perf_counter() - t0
    assert words.min() >= 0 and words.max() < 1_000_000
    # Distinct descriptors spread over the tree (discrimination, not
    # collapse): >= 90% unique words for 2048 random descriptors.
    assert len(np.unique(words)) > 0.9 * 2048

    # Text round-trip at the reference's file scale.
    p = tmp_path / "voc1m.txt"
    t0 = _time.perf_counter()
    voc.save_orbvoc_txt(p)
    t_save = _time.perf_counter() - t0
    size_mb = p.stat().st_size / 1e6
    assert size_mb > 100, f"file only {size_mb:.0f} MB"

    from orb_line_slam_tpu.utils.native import parse_orbvoc_native

    t0 = _time.perf_counter()
    parsed = parse_orbvoc_native(p)
    t_parse = _time.perf_counter() - t0
    if parsed is not None:
        voc2 = Vocabulary._from_node_list(*parsed)
        assert voc2.n_words == voc.n_words
        w2 = voc2.transform_words(descs[:256], np.ones(256, bool))
        np.testing.assert_array_equal(np.asarray(w2), np.asarray(words[:256]))
        assert t_parse < 60, f"native parse took {t_parse:.1f}s"
    print(
        f"1M-word voc: transform(2048)={t_transform*1e3:.1f}ms "
        f"save={t_save:.1f}s parse={t_parse:.1f}s file={size_mb:.0f}MB"
    )

    # Correlated place recall: places derive from a few archetypes
    # (shared scene structure), each place perturbs its archetype by a
    # handful of bits, revisits add more noise on top.  i.i.d. banks
    # overstate discrimination; this is the aliasing-prone case.
    n_arch, n_places, n_desc = 8, 48, 220
    arch = rng.integers(0, 256, (n_arch, n_desc, 32), dtype=np.uint8)

    def perturb(bank, n_flip):
        out = bank.copy()
        for _ in range(n_flip):
            rsel = rng.integers(0, n_desc, n_desc)
            out[rsel, rng.integers(0, 32, n_desc)] ^= (
                1 << rng.integers(0, 8, n_desc)
            ).astype(np.uint8)
        return out

    base = np.stack([
        perturb(arch[pl % n_arch], 3) for pl in range(n_places)
    ])
    db = KeyFrameDatabase(voc)
    ones = np.ones(n_desc, bool)
    for pl in range(n_places):
        w = voc.transform_words(base[pl], ones)
        db.add_words(pl, w, ones)
    hits = 0
    for pl in range(n_places):
        w = voc.transform_words(perturb(base[pl], 2), ones)
        ids, wts = Vocabulary.bow_from_words(w, ones, voc.word_weight)
        scores = [
            (Vocabulary.score_l1(*db.bow[pl2], ids, wts), pl2)
            for pl2 in range(n_places)
        ]
        best = max(scores)[1]
        hits += best == pl
    # With 6 same-archetype confusers per place this is the hard case;
    # the 10^6-leaf tree must still rank the true revisit first.
    assert hits >= int(0.85 * n_places), f"correlated recall {hits}/{n_places}"
