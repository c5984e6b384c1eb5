#!/usr/bin/env python3
"""Round-17 baseline ratchet (VERDICT r16 task 1, re-pin rule =
BASELINE.md normative index #6).

The r16 verdict found 81/268 queries running at <=0.6x of their pinned
baseline (56 at <=0.5x) — slack wide enough that the 2x cap would admit
a genuine 3x regression. The re-pin rule is applied to every query
measured <=0.6x in TWO consecutive rounds (r15 canary-normalized AND
r16 raw at drift 1.00x): run the set SOLO twice under the standard
Bench protocol (min-of-2/3 per query per run) with the canary trio IN
the batch (the self-normalizing in-record bracket, rule #4), then

    new pin = min(old_pin, min(run1, run2) / max(1.0, drift))

where drift = median of the two runs' in-batch canary-trio medians.
The max(1.0, ...) clamp is the non-flattering direction: a hot window
(drift > 1) deflates the reading further; a cold window (drift < 1)
never inflates it. min(old_pin, ...) makes this a pure RATCHET — a
re-pin can only tighten the cap, never relax it.

Canary pins themselves are NOT touched: q153 read 1.00x and q91 1.08x
in r16, and q163's low reading is single-round (r15 normalized 0.88x),
so the two-round rule excludes all three — BenchManifest.canaryBaselines
stays byte-identical (the spec-enforced invariant).

Usage:
  python3 tools/repin_r17.py plan                 # print the set
  python3 tools/repin_r17.py apply run1.json run2.json
     run*.json = the SPARK_GRAFT_ONLY named-map metric line of each solo
     batch. Rewrites tools/baselines.json and prints the BASELINE.md
     series table.
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
CANARIES = ("q153", "q163", "q91")

# the two-round slack set, computed from BENCH_r15 (canary-normalized at
# the r15 closing-sweep drift 1.31x) and BENCH_r16 (raw; drift_cs 1.00x)
# against the untouched tools/baselines.json — 59 queries, summed pins
# 124.7 s vs 36.0 s of r16 wall
SLACK = [
    "q06_count_matrix_sample", "q07_state_histogram", "q09_msm_rownorm",
    "q10_sliding_effective", "q16_dedup_exact", "q21_minhash_candidates",
    "q23_ann_brute", "q25_symbol_remap_join", "q26_sample_indices",
    "q28_ann_lsh", "q29_tica_projection", "q30_vamp_singular",
    "q31_msm_reversible", "q32_kmeans_assign", "q35_cond_frame",
    "q36_effective_counts", "q38_bayesian_timescales", "q39_committors",
    "q40_tpt_flux", "q41_pcca_memberships", "q46_hmm_viterbi",
    "q47_generator_ou", "q51_minibatch_kmeans", "q52_multimodal_meta",
    "q54_sample_by_state", "q55_fingerprints", "q56_expected_counts",
    "q57_hitting_probability", "q58_twostep_counts", "q62_vamp_cv",
    "q63_koopman_weights", "q64_ann_ivf", "q67_girsanov_counts",
    "q69_rate_matrix", "q71_model_invariants", "q73_estimator_invariants",
    "q76_dup_clusters", "q84_custom_kmeans", "q104_dedup_keep_best",
    "q113_streaming_dedup", "q121_asof_forward", "q130_dup_triangles",
    "q131_html_strip", "q133_bmp_decode", "q136_funnel",
    "q145_bayesian_hmm", "q155_weighted_reservoir", "q166_chunk_dedup",
    "q170_streaming_distinct", "q195_streaming_late_drop",
    "q206_stream_dedup_ttl", "q210_stream_restart", "q225_dead_letter",
    "q227_streaming_outer_join", "q253_gauss_hmm_gmm_init",
    "q258_chunk_dedup_hash", "q259_dup_pagerank_dist", "q260_asof_skew",
    "q261_asof_nearest_skew",
]


def full_names():
    names = json.load(open(os.path.join(HERE, "bench_names.json")))
    by_short = {n.split("_")[0]: n for n in names}
    return by_short


def batch_list():
    by_short = full_names()
    return SLACK + [by_short[c] for c in CANARIES]


def load_run(path):
    rec = json.load(open(path))
    qs = rec.get("queries") or rec.get("parsed", {}).get("queries")
    if qs is None:
        raise SystemExit(f"{path}: no named 'queries' map — run Bench "
                         "with SPARK_GRAFT_ONLY so it emits the legacy map")
    return {k: float(v) for k, v in qs.items()}


def trio_median(run, bases):
    rs = sorted(run[c] / bases[c] for c in CANARIES)
    return rs[1]


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in ("plan", "apply"):
        print(__doc__)
        return 2
    bpath = os.path.join(HERE, "baselines.json")
    bases = json.load(open(bpath))
    if sys.argv[1] == "plan":
        print(",".join(batch_list()))
        return 0
    run1, run2 = load_run(sys.argv[2]), load_run(sys.argv[3])
    d1, d2 = trio_median(run1, bases), trio_median(run2, bases)
    drift = (d1 + d2) / 2.0
    norm = max(1.0, drift)
    print(f"in-batch canary trio medians: run1 {d1:.3f}x run2 {d2:.3f}x "
          f"-> drift {drift:.3f}x, normalizer {norm:.3f}x")
    rows = []
    for name in SLACK:
        short = name.split("_")[0]
        old = bases[short]
        raw = min(run1[short], run2[short])
        new = min(old, round(raw / norm, 3))
        rows.append((short, name, old, run1[short], run2[short], new))
        bases[short] = new
    with open(bpath, "w") as f:
        json.dump(bases, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"rewrote {bpath}: {sum(1 for r in rows if r[5] < r[2])} of "
          f"{len(rows)} lowered, summed {sum(r[2] for r in rows):.1f} -> "
          f"{sum(r[5] for r in rows):.1f} s")
    print()
    print("| query | old pin | run1 | run2 | new pin |")
    print("|---|---|---|---|---|")
    for short, name, old, r1, r2, new in rows:
        print(f"| {name} | {old:.3f} | {r1:.3f} | {r2:.3f} | {new:.3f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
