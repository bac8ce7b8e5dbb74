"""Online bag-of-binary-words place recognition (host, numpy).

Reference equivalent: DBoW2-style vocabulary + inverted-index database
(SURVEY.md §2.1 "Loop detector / place recognition"). The reference loads
a pretrained vocabulary file; with no network and no binary assets in this
environment, the vocabulary is grown ONLINE: each 256-bit ORB descriptor
is assigned to its nearest visual word within a Hamming radius, or founds
a new word (up to a cap). Keyframes are TF-IDF vectors over words; query
scoring is cosine similarity via an inverted index, with temporal-adjacency
exclusion — the same candidate-gating policy as the reference.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def hamming_distances(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise Hamming distances between (N, 32) and (M, 32) uint8 rows.

    Uses the native C++ popcount kernel when built (rgbid_tpu.native);
    the numpy bitwise_count path is the tested fallback/oracle.
    """
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.int32)
    try:
        from .. import native

        if native.available():
            return native.hamming_batch(a, b)
    except Exception:
        pass
    a64 = np.ascontiguousarray(a).view(np.uint64)  # (N, 4)
    b64 = np.ascontiguousarray(b).view(np.uint64)  # (M, 4)
    out = np.zeros((len(a), len(b)), np.int32)
    # Chunk over a to bound the (chunk, M, 4) xor intermediate.
    step = max(1, int(4e6 // max(len(b), 1)))
    for i in range(0, len(a), step):
        x = np.bitwise_xor(a64[i : i + step, None, :], b64[None, :, :])
        out[i : i + step] = np.bitwise_count(x).sum(axis=2, dtype=np.int32)
    return out


class OnlineVocabulary:
    """Flat visual vocabulary grown from the data stream."""

    def __init__(self, max_words: int = 512, radius: int = 80):
        self.max_words = max_words
        self.radius = radius
        self.words = np.zeros((0, 32), np.uint8)

    def assign(self, desc: np.ndarray, grow: bool = True) -> np.ndarray:
        """Assign descriptors (N, 32) to word ids, growing the vocabulary.

        Returns (N,) int32 word ids.
        """
        n = len(desc)
        ids = np.full(n, -1, np.int32)
        if n == 0:
            return ids
        for i in range(n):
            if len(self.words) > 0:
                d = hamming_distances(desc[i : i + 1], self.words)[0]
                j = int(np.argmin(d))
                if d[j] <= self.radius or (not grow) or len(self.words) >= self.max_words:
                    ids[i] = j
                    continue
            if grow and len(self.words) < self.max_words:
                self.words = np.concatenate([self.words, desc[i : i + 1]], axis=0)
                ids[i] = len(self.words) - 1
            else:
                ids[i] = 0 if len(self.words) else -1
        return ids


class BowDatabase:
    """TF-IDF inverted-index keyframe database with temporal gating."""

    def __init__(
        self,
        max_words: int = 512,
        radius: int = 80,
        min_score: float = 0.12,
        min_gap: int = 10,
        max_candidates: int = 4,
    ):
        self.vocab = OnlineVocabulary(max_words, radius)
        self.min_score = min_score
        self.min_gap = min_gap
        self.max_candidates = max_candidates
        # keyframe id -> sparse word-count dict
        self.entries: Dict[int, Dict[int, int]] = {}
        # word id -> list of keyframe ids containing it
        self.inverted: Dict[int, List[int]] = {}

    # ------------------------------------------------------------------
    def _bow(self, desc: np.ndarray, grow: bool) -> Dict[int, int]:
        ids = self.vocab.assign(desc, grow=grow)
        counts: Dict[int, int] = {}
        for w in ids:
            if w >= 0:
                counts[int(w)] = counts.get(int(w), 0) + 1
        return counts

    def _idf(self, word: int) -> float:
        n_kf = max(len(self.entries), 1)
        n_w = max(len(self.inverted.get(word, ())), 1)
        return float(np.log(n_kf / n_w)) + 1e-3

    def _vector(self, counts: Dict[int, int]) -> Dict[int, float]:
        vec = {w: c * self._idf(w) for w, c in counts.items()}
        norm = np.sqrt(sum(v * v for v in vec.values()))
        if norm > 0:
            vec = {w: v / norm for w, v in vec.items()}
        return vec

    # ------------------------------------------------------------------
    def query(self, kf_id: int, desc: np.ndarray) -> List[Tuple[int, float]]:
        """Score against stored keyframes (excluding temporal neighbors).

        Returns [(kf_id, score)] sorted by descending score, gated.
        """
        counts = self._bow(desc, grow=False)
        vec = self._vector(counts)
        # Gather candidate kfs sharing at least one word.
        cand_ids = set()
        for w in counts:
            cand_ids.update(self.inverted.get(w, ()))
        scores = []
        for cid in cand_ids:
            if abs(cid - kf_id) < self.min_gap:
                continue
            cvec = self._vector(self.entries[cid])
            s = sum(vec.get(w, 0.0) * v for w, v in cvec.items())
            if s >= self.min_score:
                scores.append((cid, float(s)))
        scores.sort(key=lambda t: -t[1])
        return scores[: self.max_candidates]

    def insert(self, kf_id: int, desc: np.ndarray) -> None:
        counts = self._bow(desc, grow=True)
        self.entries[kf_id] = counts
        for w in counts:
            self.inverted.setdefault(w, []).append(kf_id)
