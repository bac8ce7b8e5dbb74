"""Hierarchical BoW vocabulary: tree structure, batched assignment,
exact-vs-descent agreement, in-run training handover, and a synthetic
revisit recall/precision benchmark (SURVEY.md §2.1 loop detector row).
"""

import time

import numpy as np
import pytest

from rgbid_tpu.backend.place_recognition import (
    BowDatabase,
    HierarchicalVocabulary,
    hamming_distances,
)


def _random_descs(n, rng, clusters=16, flip=0.08):
    """Clustered binary descriptors: `clusters` prototypes + bit noise."""
    protos = rng.integers(0, 256, (clusters, 32), dtype=np.uint8)
    idx = rng.integers(0, clusters, n)
    descs = protos[idx]
    noise = (rng.random((n, 32, 8)) < flip).astype(np.uint8)
    noise = np.packbits(noise, axis=-1).reshape(n, 32)
    return np.bitwise_xor(descs, noise), idx


def test_tree_is_complete_and_real():
    rng = np.random.default_rng(0)
    descs, _ = _random_descs(4000, rng)
    voc = HierarchicalVocabulary(branching=8, levels=3)
    voc.train(descs)
    assert voc.trained
    # Complete tree: every level has branching^(l+1) nodes; words = B^L.
    assert [len(n) for n in voc.nodes] == [8, 64, 512]
    assert voc.num_words == 512
    # Words are actual Hamming-space centers: mean distance of descriptors
    # to their assigned word must be far below random (128 bits).
    ids = voc.assign(descs)
    d = hamming_distances(descs, voc.words)
    mean_d = d[np.arange(len(descs)), ids].mean()
    assert mean_d < 60, mean_d


def test_exact_assignment_is_nearest_word():
    rng = np.random.default_rng(1)
    descs, _ = _random_descs(500, rng)
    voc = HierarchicalVocabulary(branching=4, levels=2)
    voc.train(descs)
    ids = voc.assign(descs)
    d = hamming_distances(descs, voc.words)
    np.testing.assert_array_equal(ids, d.argmin(axis=1))


def test_hierarchical_descent_agrees_mostly():
    rng = np.random.default_rng(2)
    descs, _ = _random_descs(3000, rng)
    voc = HierarchicalVocabulary(branching=8, levels=3)
    voc.train(descs)
    exact = voc.assign(descs)
    approx = voc.assign_hierarchical(descs)
    assert approx.min() >= 0 and approx.max() < voc.num_words
    agreement = (exact == approx).mean()
    # Descent is approximate (that's its point at DBoW2 scale); on a
    # clustered corpus it should land on the exact word most of the time.
    assert agreement > 0.6, agreement


def test_assignment_speed_batched():
    """One keyframe (500 descriptors) against 512 words: must be a single
    batched pass, far under the reference's per-keyframe budget."""
    rng = np.random.default_rng(3)
    corpus, _ = _random_descs(4000, rng)
    voc = HierarchicalVocabulary(branching=8, levels=3)
    voc.train(corpus)
    kf, _ = _random_descs(500, rng)
    voc.assign(kf)  # warm
    t0 = time.perf_counter()
    for _ in range(20):
        voc.assign(kf)
    per_kf_ms = (time.perf_counter() - t0) / 20 * 1e3
    # Native popcount path: ~0.1 ms. Generous CI bound; the measured
    # number is recorded in BASELINE.md.
    assert per_kf_ms < 10.0, per_kf_ms


def test_database_trains_and_requantizes():
    rng = np.random.default_rng(4)
    db = BowDatabase(min_score=0.0, min_gap=2, max_candidates=5, train_after=2000)
    kfs = []
    for i in range(8):
        d, _ = _random_descs(400, rng, clusters=12)
        kfs.append(d)
        db.insert(i, d)
    # 8 * 400 = 3200 > 2000: the tree must have been trained and all
    # stored keyframes re-quantized against it.
    assert db.vocab.trained
    assert db.vocab.num_words == 512
    assert set(db.entries) == set(range(8))
    for counts in db.entries.values():
        assert all(0 <= w < 512 for w in counts)
        assert sum(counts.values()) > 0
    # Self-similarity: querying a stored keyframe's own descriptors must
    # rank itself (gap-excluded neighbors aside) at the top.
    res = db.query(99, kfs[3])
    assert res and res[0][0] == 3


def test_revisit_recall_benchmark():
    """>=100-keyframe synthetic revisit benchmark (VERDICT r1 item 3):
    two passes around the same loop; a query keyframe from the second
    pass must retrieve a first-pass keyframe of the same place."""
    import cv2

    from rgbid_tpu.backend.features import extract_orb
    from rgbid_tpu.core.camera import Intrinsics
    from rgbid_tpu.datasets import synthetic

    intr = Intrinsics(fx=129.3, fy=129.1, cx=79.6, cy=59.8, width=160, height=120)
    n_per_loop = 55
    poses = synthetic.loopy_trajectory(n_per_loop, radius=0.45, rot_amp=0.12)
    poses = poses + poses  # revisit: second identical pass
    seq = synthetic.generate_sequence(
        n_frames=len(poses), intr=intr, motion=poses, seed=7
    )
    n = len(poses)
    min_gap = 12
    db = BowDatabase(
        min_score=0.02, min_gap=min_gap, max_candidates=4, train_after=1500
    )
    descs = []
    for i in range(n):
        gray = cv2.cvtColor(seq.rgb[i], cv2.COLOR_RGB2GRAY)
        _, d = extract_orb(gray, 300)
        descs.append(d)

    def pose_dist(i, j):
        return np.linalg.norm(poses[i][:3, 3] - poses[j][:3, 3])

    hits, misses, n_returned, n_true = 0, 0, 0, 0
    for i in range(n):
        positives = {
            j
            for j in range(i)
            if abs(i - j) >= min_gap and pose_dist(i, j) < 0.15
        }
        if positives:
            got = db.query(i, descs[i])
            returned = {cid for cid, _ in got}
            n_returned += len(returned)
            n_true += len(returned & positives)
            if returned & positives:
                hits += 1
            else:
                misses += 1
        db.insert(i, descs[i])
    assert db.vocab.trained  # the benchmark exercises the REAL tree
    recall = hits / max(hits + misses, 1)
    precision = n_true / max(n_returned, 1)
    print(f"revisit recall@4 = {recall:.3f}, precision = {precision:.3f} "
          f"({hits}/{hits+misses} queries)")
    assert recall >= 0.7, (recall, precision)
    assert precision >= 0.5, (recall, precision)


def test_revisit_benchmark_pretrained_default():
    """The DEFAULT configuration (packaged b8l4 vocabulary + sqrt-tf +
    relative-score gating — what BackendConfig now ships) must beat the
    in-run-trained configuration's round-2 precision on the same
    disjoint revisit benchmark (round-3 VERDICT item 5: flip the default
    once precision >= 0.88 at recall 1.0; measured 0.92-0.98 over three
    seeds)."""
    import cv2

    from rgbid_tpu.backend.features import extract_orb
    from rgbid_tpu.core.camera import Intrinsics
    from rgbid_tpu.datasets import synthetic

    intr = Intrinsics(fx=129.3, fy=129.1, cx=79.6, cy=59.8, width=160, height=120)
    n_per_loop = 55
    poses = synthetic.loopy_trajectory(n_per_loop, radius=0.45, rot_amp=0.12)
    poses = poses + poses
    seq = synthetic.generate_sequence(
        n_frames=len(poses), intr=intr, motion=poses, seed=7
    )
    n = len(poses)
    min_gap = 12
    db = BowDatabase(
        min_score=0.02, min_gap=min_gap, max_candidates=4,
        vocab_path="builtin", tf_mode="sqrt", rel_score=0.65,
    )
    descs = []
    for i in range(n):
        gray = cv2.cvtColor(seq.rgb[i], cv2.COLOR_RGB2GRAY)
        _, d = extract_orb(gray, 300)
        descs.append(d)

    def pose_dist(i, j):
        return np.linalg.norm(poses[i][:3, 3] - poses[j][:3, 3])

    hits, misses, n_returned, n_true = 0, 0, 0, 0
    for i in range(n):
        positives = {
            j
            for j in range(i)
            if abs(i - j) >= min_gap and pose_dist(i, j) < 0.15
        }
        if positives:
            got = db.query(i, descs[i])
            returned = {cid for cid, _ in got}
            n_returned += len(returned)
            n_true += len(returned & positives)
            if returned & positives:
                hits += 1
            else:
                misses += 1
        db.insert(i, descs[i])
    recall = hits / max(hits + misses, 1)
    precision = n_true / max(n_returned, 1)
    print(f"pretrained-default revisit recall@4 = {recall:.3f}, "
          f"precision = {precision:.3f}")
    assert recall >= 0.95, (recall, precision)
    assert precision >= 0.85, (recall, precision)


def test_vocabulary_save_load_roundtrip(tmp_path):
    """Vocabulary-file parity (the reference's pretrained DBoW2 model):
    save/load must preserve the exact tree and its assignments."""
    from rgbid_tpu.backend.place_recognition import HierarchicalVocabulary

    rng = np.random.default_rng(11)
    corpus, _ = _random_descs(3000, rng, clusters=40)
    v = HierarchicalVocabulary(branching=4, levels=3)
    v.train(corpus)
    path = str(tmp_path / "vocab.npz")
    v.save(path)
    v2 = HierarchicalVocabulary.load(path)
    assert v2.branching == 4 and v2.levels == 3 and v2.trained
    probe, _ = _random_descs(500, rng, clusters=40)
    np.testing.assert_array_equal(v.assign(probe), v2.assign(probe))
    np.testing.assert_array_equal(
        v.assign_hierarchical(probe), v2.assign_hierarchical(probe)
    )


def test_builtin_vocabulary_loads_and_quantizes():
    """The packaged vocabulary (rgbid_tpu/data/vocab_b8l4.npz, built by
    backend.build_vocab, the config DEFAULT since round 3) must load and
    give stable quantization from keyframe 0 — no flat cold start, no
    in-run retraining."""
    rng = np.random.default_rng(12)
    db = BowDatabase(min_score=0.0, min_gap=2, vocab_path="builtin")
    assert db.vocab.trained and db.vocab.num_words == 4096
    d, _ = _random_descs(400, rng, clusters=12)
    db.insert(0, d)
    counts0 = dict(db.entries[0])
    # Insert many more keyframes: a pretrained vocabulary never retrains,
    # so keyframe 0's quantization must not change.
    for i in range(1, 12):
        di, _ = _random_descs(400, rng, clusters=12)
        db.insert(i, di)
    assert db.entries[0] == counts0
    res = db.query(99, d)
    assert res and res[0][0] == 0
