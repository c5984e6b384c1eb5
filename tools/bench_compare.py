#!/usr/bin/env python3
"""Compare a bench JSON line against the per-query baselines.

Usage: python3 tools/bench_compare.py <bench.log|bench.json> [cap] [--subset]

Parses the LAST {"metric":...} line from the file, joins against the
baseline table below (values = first round in which each query appeared,
per BASELINE.md protocol), and prints ratio-sorted results plus any
cap violations (default cap 2.0; pass 1.5 for the contended gate).

A queries_ms / bench_names.json length mismatch is a hard error (exit 2)
unless --subset is passed, in which case only the named top-10 'queries'
subset is compared (clearly reduced coverage, stated in the output).

Noise floor (BASELINE.md "cap ledger noise floor" rule): entries whose
baseline is < 200 ms AND whose absolute delta is < 300 ms AND whose ratio
is < 3x are below the box's measured scheduler jitter — their ratios are
reported in a separate noise-floor section and never counted as cap
violations. The 3x ratio bound keeps a genuinely-regressed tiny query
from hiding in the noise section forever (ADVICE r09).
"""
import json
import re
import sys

BASELINES = {
    "q01": 0.430, "q02": 0.539, "q03": 0.450, "q04": 0.776, "q05": 0.416,
    "q06": 0.553, "q07": 0.288, "q08": 0.225, "q09": 0.467, "q10": 0.534,
    "q11": 0.401, "q12": 0.521, "q13": 0.136, "q14": 0.356, "q15": 0.290,
    "q16": 2.404, "q17": 0.197, "q18": 0.136, "q19": 0.120, "q20": 0.516,
    "q21": 8.531, "q22": 0.136, "q23": 2.212, "q24": 0.156, "q25": 0.492,
    "q26": 5.257, "q27": 1.592, "q28": 3.898, "q29": 1.231, "q30": 4.073,
    "q31": 0.525, "q32": 4.851, "q33": 0.675, "q34": 0.862, "q35": 0.424,
    "q36": 6.505, "q37": 0.706, "q38": 4.260, "q39": 0.483, "q40": 0.541,
    "q41": 0.568, "q42": 0.169, "q43": 0.236, "q44": 1.010, "q45": 0.700,
    "q46": 2.386, "q47": 0.534, "q48": 0.671, "q49": 1.101, "q50": 0.332,
    "q51": 3.391, "q52": 0.203, "q53": 0.154, "q54": 0.587, "q55": 0.528,
    "q56": 0.547, "q57": 0.950, "q58": 0.769, "q59": 1.280, "q60": 3.204,
    "q61": 0.572, "q62": 4.814, "q63": 1.650, "q64": 2.891, "q65": 0.461,
    "q66": 1.915, "q67": 1.040, "q68": 0.720, "q69": 0.580, "q70": 0.110,
    "q71": 2.560, "q72": 0.630, "q73": 2.450, "q74": 0.120, "q75": 0.280,
    "q76": 4.670, "q77": 0.230, "q78": 0.490, "q79": 0.330, "q80": 0.120,
    "q81": 0.250, "q82": 0.240, "q83": 0.180, "q84": 3.584, "q85": 0.393,
    "q86": 0.726,
    # r05 first-appearance values
    "q87": 0.090, "q88": 0.332, "q89": 0.477, "q90": 0.949,
    # r06 first-appearance values
    # q93 corrected late round 7: 0.263 was an artifact of the (since-
    # fixed) corpus-window cache leak making bench pass 2 free
    "q91": 0.850, "q92": 0.318, "q93": 1.381,
    # r07 first-appearance values (final quiet sweep, post native-shingle
    # optimization — q94-q100 were authored in r06 but BENCH_r06 never ran
    # driver-side, so their first driver record is r07)
    "q94": 0.115, "q95": 0.104, "q96": 0.551, "q97": 0.562, "q98": 1.255,
    "q99": 2.949, "q100": 0.461, "q101": 2.692, "q102": 2.929,
    "q103": 0.979, "q104": 2.887, "q105": 0.508, "q106": 0.257,
    "q107": 0.425, "q108": 0.120, "q109": 0.504, "q110": 0.105,
    "q111": 3.314, "q112": 0.707, "q113": 1.832, "q114": 0.198, "q115": 0.854,
    "q116": 0.727, "q117": 0.981, "q118": 2.115, "q119": 0.475,
    "q120": 0.398, "q121": 0.292, "q122": 0.547, "q123": 0.815,
    "q124": 0.667, "q125": 0.717, "q126": 2.170, "q127": 0.530,
    "q128": 0.607, "q129": 0.887, "q130": 2.649, "q131": 0.251,
    "q132": 0.465, "q133": 0.254, "q134": 0.600, "q135": 0.347,
    "q136": 1.400, "q137": 0.605,
    # round-8 build cycle first-appearance values (quiet sweep)
    "q138": 0.300, "q139": 0.490, "q140": 0.386, "q141": 4.727,
    "q142": 0.767, "q143": 0.506, "q144": 0.667, "q145": 2.101,
    "q146": 1.842, "q147": 1.180, "q148": 0.513, "q149": 0.209,
    "q150": 2.613, "q151": 0.371,
    # round-8 build cycle, second batch (quiet sweep first-appearance)
    "q152": 0.392, "q153": 4.224, "q154": 1.075, "q155": 0.289,
    "q156": 0.182, "q157": 0.048, "q158": 1.626, "q159": 1.342,
    "q160": 0.134, "q161": 0.360,
    # q162 first appearance: targeted two-pass min (post-warmup), not a
    # full-sweep slot — conservative by construction
    "q162": 0.673,
    "q163": 4.906, "q164": 1.068,
    # round-7 third batch first-appearance (quiet full sweep, post-memoization)
    "q165": 2.125, "q166": 0.368, "q167": 0.535, "q168": 0.613,  # corrected: 0.104 was a fast-crash artifact (LOCATION_ALREADY_EXISTS), see BASELINE.md
    "q169": 0.120, "q170": 5.555, "q171": 1.393, "q172": 3.715,
    "q173": 0.638, "q174": 0.418, "q175": 0.199, "q176": 1.042,
    "q177": 1.299, "q178": 0.607, "q179": 0.198, "q180": 0.167,
    "q181": 0.360,
    # round-7 fourth batch first-appearance (quiet full sweep)
    "q182": 0.747, "q183": 0.814, "q184": 0.333, "q185": 0.424,
    "q186": 0.378, "q187": 0.338, "q188": 0.199, "q189": 0.231,
    # round-7 fifth batch first-appearance (quiet full sweep, 207-query
    # surface): PCA/corr (q190/q191), IVF+PQ (q192), JSONL/CSV/ORC
    # sources (q193/q194/q197), late-drop + global index (q195/q196),
    # z-order (q198), A/B z-test (q199), CCNet buckets (q200), random
    # projection (q201), mutual-kNN (q202), FFT (q203), SCD2 (q204),
    # dataset card (q205), TTL streaming dedup (q206), URL canon (q207)
    "q190": 0.429, "q191": 0.268, "q192": 3.701, "q193": 0.421,
    "q194": 0.437, "q195": 3.788, "q196": 0.563, "q197": 0.459,
    "q198": 0.296, "q199": 0.161, "q200": 0.993, "q201": 0.247,
    "q202": 1.492, "q203": 0.134, "q204": 0.301, "q205": 0.402,
    "q206": 2.346, "q207": 0.314,
    # round-7 sixth batch first-appearance (quiet full sweep, 226-query
    # surface): EWMA/zscore/restart/backfill/cube (q208-q212), kNN eval
    # (q213), pruning proof (q214), bloom runtime filter (q215), basket
    # lift (q216), tolerance asof (q217), bitmap (q218), streaks (q219),
    # BM25 (q220), RRF (q221), OLS (q222), WoW (q223), data quality
    # (q224-q226)
    "q208": 0.270, "q209": 0.455, "q210": 4.573, "q211": 1.358,
    "q212": 0.260, "q213": 0.887, "q214": 1.234, "q215": 0.809,
    "q216": 1.148, "q217": 0.215, "q218": 0.347, "q219": 0.276,
    "q220": 1.479, "q221": 2.893, "q222": 0.203, "q223": 0.411,
    "q224": 0.620, "q225": 1.020, "q226": 0.537,
    # round-7 seventh batch first-appearance (quiet full sweep, 241-query
    # surface): outer stream join (q227), delete audit (q228), Markov
    # prediction (q229), novelty (q230), Neyman (q231), centroid sim
    # (q232), RFM (q233), Welch (q234), engagement (q235), decayed counts
    # (q236), quantile transform (q237), vocab overlap (q238),
    # time-to-convert (q239), Pareto (q240), weighted median (q241)
    "q227": 8.125, "q228": 0.409, "q229": 0.732, "q230": 1.034,
    "q231": 0.225, "q232": 0.436, "q233": 0.506, "q234": 0.161,
    "q235": 0.536, "q236": 0.284, "q237": 0.398, "q238": 0.550,
    "q239": 0.670, "q240": 0.366, "q241": 1.657,
    # round-8 first-appearance values (quiet sweep on the 249 surface):
    # per-group percentiles (q242), MAD (q243), kappa (q244), TRAM overlap
    # (q245) + restriction (q246), Bayesian Gaussian HMM (q247),
    # fingerprint battery (q248), box one-hot (q249)
    "q242": 0.560, "q243": 0.392, "q244": 0.514, "q245": 0.425,
    "q246": 0.333, "q247": 2.681, "q248": 0.208, "q249": 0.556,
    # final round-8 sweep first-appearance: persistence roundtrips (q250),
    # sparse covariance (q251), TRAM model evaluation (q252)
    "q250": 1.002, "q251": 0.907, "q252": 2.828,
    # round-9 first-appearance: GMM-parity Gaussian-HMM init (q253),
    # 2-state closed-form sensitivity values (q254), fixed-pi spectral
    # amplitude replay (q255) — quiet full sweep, r9 build cycle
    "q253": 2.757, "q254": 0.333, "q255": 0.419,
    # q256 first appearance: targeted two-run min (q162 precedent —
    # authored after the round's final full sweep), sign-LSH star regime
    "q256": 0.893,
    # round-10 first-appearance: fixed-pi reversible Bayesian sampler
    # battery (q257) — Profile steady min 0.43 s plus in-sweep overhead;
    # to be confirmed against the round-10 final quiet sweep
    "q257": 0.55,
}


def _last_metric_line(text):
    """Last complete {"metric":...} JSON object in the text, or None."""
    line = None
    for ln in text.splitlines():
        idx = ln.find('{"metric"')
        if idx >= 0:
            cand = ln[idx:].strip()
            try:
                json.loads(cand)
                line = cand
            except json.JSONDecodeError:
                pass  # truncated copy (e.g. clipped at the tail boundary)
    return line


NOISE_BASELINE_S = 0.200  # baselines under this are scheduler-noise-sized
NOISE_DELTA_S = 0.300     # measured same-box jitter; deltas under this are noise
NOISE_RATIO_MAX = 3.0     # even a tiny-baseline entry over this ratio is a
                          # real violation, not noise — without this bound a
                          # sub-200 ms query could regress ~2.5x forever and
                          # only ever show up in the printed noise section


def _decode_queries(rec, allow_subset=False):
    """Per-query seconds from a bench record.

    Preferred: "queries_ms" (integer ms, rank-ordered by ascending query
    number) decoded via tools/bench_names.json. Falls back to the legacy
    full "queries" map (in the new format "queries" is only a top-10
    subset, so queries_ms always wins when present).
    """
    if "queries_ms" in rec:
        import os
        names_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "bench_names.json")
        with open(names_path) as f:
            names = json.load(f)
        ms = rec["queries_ms"]
        if len(ms) != len(names):
            # a mid-sequence divergence would silently mislabel every
            # timing after it — refuse positional decoding entirely. A
            # stale manifest must NOT quietly shrink cap coverage from the
            # full surface to the top-10 subset, so this is a hard error
            # unless the caller explicitly opted into --subset.
            msg = (f"ERROR: {len(ms)} timings vs {len(names)} manifest "
                   f"names — the record and tools/bench_names.json are from "
                   f"different surfaces; positional decode would mislabel "
                   f"queries. Regenerate the manifest "
                   f"(graft.tools.BenchManifest) from the record's commit.")
            if not allow_subset:
                print(msg)
                print("Refusing to compare (pass --subset to force the "
                      "reduced top-10 named comparison).")
                sys.exit(2)
            print(msg)
            print("--subset given: comparing ONLY the named top-10 subset "
                  "(reduced coverage).")
            return rec.get("queries", {})
        short = [n.split("_")[0] for n in names]
        return {short[i]: ms[i] / 1000.0 for i in range(len(ms))}
    return rec["queries"]


def main():
    args = [a for a in sys.argv[1:] if a != "--subset"]
    allow_subset = "--subset" in sys.argv[1:]
    path = args[0]
    cap = float(args[1]) if len(args) > 1 else 2.0
    with open(path) as f:
        text = f.read()
    rec = None
    # BENCH_r{N}.json driver record: {"n":..,"rc":..,"tail":..,"parsed":..}
    try:
        outer = json.loads(text)
        if isinstance(outer, dict) and ("parsed" in outer or "tail" in outer):
            if outer.get("parsed"):
                rec = outer["parsed"]
            else:
                line = _last_metric_line(outer.get("tail", ""))
                if line:
                    rec = json.loads(line)
        elif isinstance(outer, dict) and "metric" in outer:
            rec = outer
    except json.JSONDecodeError:
        pass
    if rec is None:  # raw log: scan for the last complete metric line
        line = _last_metric_line(text)
        if line is None:
            print("no bench line found")
            sys.exit(1)
        rec = json.loads(line)
    qs = _decode_queries(rec, allow_subset)
    rows = []
    for k, v in qs.items():
        b = BASELINES.get(k)
        rows.append((k, v, b, v / b if b else None))
    rows.sort(key=lambda r: -(r[3] or 0))

    def is_noise(r):  # sub-scheduler-jitter entries: never cap violations
        _, v, b, ratio = r
        return (ratio is not None and b < NOISE_BASELINE_S
                and abs(v - b) < NOISE_DELTA_S and ratio < NOISE_RATIO_MAX)

    viol = [r for r in rows if r[3] and r[3] > cap and not is_noise(r)]
    noise = [r for r in rows if r[3] and r[3] > cap and is_noise(r)]
    new = [r for r in rows if r[3] is None]
    print(f"total {rec['value']:.1f}s over {len(qs)} queries; "
          f"baselined sum {sum(r[1] for r in rows if r[2]):.1f}s vs "
          f"{sum(r[2] for r in rows if r[2]):.1f}s = "
          f"{sum(r[1] for r in rows if r[2]) / sum(r[2] for r in rows if r[2]):.2f}x")
    print(f"\ntop ratios (cap {cap}x):")
    for row in rows[:15]:
        k, v, b, r = row
        flag = ""
        if r and r > cap:
            flag = (" <-- noise floor (not a violation)" if is_noise(row)
                    else " <-- VIOLATION")
        print(f"  {k}  {v:7.3f}s  base {b if b else '---':>7}  "
              f"{f'{r:.2f}x' if r else 'new'}{flag}")
    if new:
        print("\nnew queries (no baseline yet): " +
              ", ".join(f"{k}={v:.3f}s" for k, v, _, _ in new))
    if noise:
        print(f"\nnoise-floor entries over cap (baseline < "
              f"{NOISE_BASELINE_S*1000:.0f} ms and delta < "
              f"{NOISE_DELTA_S*1000:.0f} ms — excluded from the ledger): "
              + ", ".join(f"{k} {r:.2f}x ({v*1000:.0f} ms vs {b*1000:.0f} ms)"
                          for k, v, b, r in noise))
    print(f"\n{len(viol)} violation(s) at cap {cap}x"
          + ("" if not viol else ": " + ", ".join(r[0] for r in viol)))


if __name__ == "__main__":
    main()
