"""Back end: loop-closure detection + pose-graph optimization.

TPU-native equivalent of the reference's back-end thread (SURVEY.md §3.3):
ORB features + bag-of-words place recognition and the pose-graph solve stay
on the host (exactly the reference's CPU split), while loop-candidate
verification — dense alignment between keyframe pairs — runs as a
vmap-batched device program (BASELINE.json:5 "batched TPU relocalization
scoring").

One deliberate divergence: the reference loads a pretrained DBoW2
vocabulary file; this environment has no network and ships no binary
assets, so the vocabulary is built ONLINE from the keyframe stream
(flat hamming-radius clustering with TF-IDF scoring). The database API
(insert/query with temporal gating) mirrors the reference's.
"""

from .place_recognition import BowDatabase, OnlineVocabulary  # noqa: F401
from .pose_graph import PoseGraph, optimize_pose_graph  # noqa: F401
from .relocalization import RelocScorer  # noqa: F401
