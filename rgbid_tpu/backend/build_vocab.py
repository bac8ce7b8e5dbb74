"""Offline vocabulary builder (the reference's pretrained DBoW2 model).

The reference ships a vocabulary file trained offline on a large image
corpus and loads it at startup (SURVEY.md §2.1 "Loop detector"). This
environment has no network, so the equivalent corpus is rendered: ORB
descriptors are extracted from many synthetic scenes (different seeds,
viewpoints, and illumination) and a branching^levels hierarchical
k-medians tree is trained and serialized.

    python -m rgbid_tpu.backend.build_vocab --out rgbid_tpu/data/vocab_b8l4.npz

The packaged default (rgbid_tpu/data/vocab_b8l4.npz, 8^4 = 4096 words)
was produced by this script and is selected by the default config
(backend.vocab_path="builtin").
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def build_corpus(
    n_scenes: int = 48, frames_per_scene: int = 8, num_features: int = 500
) -> np.ndarray:
    """Multi-scene, multi-condition ORB corpus.

    Diversity axes (each a measured precision lever on the disjoint
    revisit benchmark — round 3): scene seed (texture spectra), TWO
    resolutions (the ORB patch statistics the tree must cover depend on
    scale), orbit vs loop motion (viewpoint coverage), and exposure
    drift on a third of the scenes (illumination robustness).
    """
    from ..core.camera import Intrinsics
    from ..datasets import synthetic
    from .features import extract_orb

    intrs = [
        Intrinsics(fx=258.6, fy=258.2, cx=159.5, cy=119.5, width=320, height=240),
        Intrinsics(fx=129.3, fy=129.1, cx=79.5, cy=59.5, width=160, height=120),
    ]
    descs = []
    for s in range(n_scenes):
        if s % 2 == 0:
            mkw = dict(
                motion="orbit",
                trans_amp=0.2 + 0.05 * (s % 4),
                rot_amp=0.05 + 0.02 * (s % 3),
            )
        else:
            mkw = dict(
                motion="loop",
                radius=0.35 + 0.05 * (s % 4),
                rot_amp=0.08 + 0.02 * (s % 3),
            )
        seq = synthetic.generate_sequence(
            n_frames=frames_per_scene,
            intr=intrs[s % len(intrs)],
            exposure_drift=0.15 if s % 3 == 0 else 0.0,
            seed=100 + s,
            **mkw,
        )
        for i in range(len(seq)):
            try:
                import cv2

                gray = cv2.cvtColor(seq.rgb[i], cv2.COLOR_RGB2GRAY)
            except Exception:
                gray = seq.rgb[i].mean(axis=2).astype(np.uint8)
            _, d = extract_orb(gray, num_features)
            if len(d):
                descs.append(d)
    return np.concatenate(descs).astype(np.uint8)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--branching", type=int, default=8)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--scenes", type=int, default=48)
    ap.add_argument("--frames-per-scene", type=int, default=8)
    args = ap.parse_args(argv)

    from .place_recognition import HierarchicalVocabulary

    corpus = build_corpus(args.scenes, args.frames_per_scene)
    print(f"corpus: {len(corpus)} descriptors", file=sys.stderr)
    vocab = HierarchicalVocabulary(args.branching, args.levels)
    vocab.train(corpus)
    vocab.save(args.out)
    print(
        f"saved {args.branching}^{args.levels} = {vocab.num_words}-word "
        f"vocabulary to {args.out}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
