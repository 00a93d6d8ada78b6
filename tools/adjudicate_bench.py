#!/usr/bin/env python3
"""Dev-only harness (not part of the engine): adjudicate dirty bench rows
across two full-registry runs, mechanizing the cross-run procedure the
verify skill documents for stamp decisions.

The per-query dirty flag is a detector, not a verdict: on this box a quiet
full run still flags a handful of rows from routine GC blips (disjoint sets
across consecutive runs), and a hot host inflates cpu broadly (r11: median
1.19x with 2.2-2.4x tails, steal_pct 0.4 vs 0.009 idle). The adjudication
rule, from the r10 re-stamp experience: trust cross-RUN agreement, not flag
status --
  - flagged in ONE run only            -> transient; take the other run's value
  - flagged in BOTH, runs AGREE (<=25% apart) and local steal is material
                                       -> ambient host; don't chase code
  - flagged in BOTH, runs AGREE, steal near zero, cpu inflated but wall
    near-flat                          -> shared-cache/bandwidth co-tenancy:
                                          stall cycles count as CPU time but
                                          steal only shows when vCPUs are
                                          descheduled (r11: q70 cpu 2.14x at
                                          wall 1.39x, identical code+data vs
                                          the same-morning stamp; exonerated
                                          by a skip-extras A/B on the same box)
  - flagged in BOTH, runs AGREE, steal near zero, wall moving WITH cpu
                                       -> the OLD baseline row is the outlier
                                          (r10 q115: both runs ~2.4 vs old 1.1)
                                          or a real code change -- check src_sha
  - flagged in BOTH, runs DISAGREE     -> unstable row; needs more reps

Usage: python3 tools/adjudicate_bench.py detail_run1.json detail_run2.json
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    run = d.get("_run", {})
    rows = {k: v for k, v in d.items() if not k.startswith("_") and isinstance(v, dict)}
    return run, rows


def main(p1, p2):
    run1, rows1 = load(p1)
    run2, rows2 = load(p2)

    def membw(run):
        a, b = run.get("membw_mbps_start"), run.get("membw_mbps_end")
        vals = [v for v in (a, b) if v is not None]
        out = f"membw={min(vals):.0f}-{max(vals):.0f}MB/s " if vals else ""
        sm, bg = run.get("cpu_ratio_median_small"), run.get("cpu_ratio_median_big")
        if sm is not None or bg is not None:
            out += f"strata(s/b)={sm}/{bg} "
        return out

    print(f"run1: contended={run1.get('contended')} dirty={len(run1.get('dirty_queries', []))} "
          f"steal={run1.get('steal_pct', 'n/a')} {membw(run1)}probe_ratio={run1.get('probe_ratio')}")
    print(f"run2: contended={run2.get('contended')} dirty={len(run2.get('dirty_queries', []))} "
          f"steal={run2.get('steal_pct', 'n/a')} {membw(run2)}probe_ratio={run2.get('probe_ratio')}")
    d1 = set(run1.get("dirty_queries", []))
    d2 = set(run2.get("dirty_queries", []))
    both, only1, only2 = d1 & d2, d1 - d2, d2 - d1
    print(f"\ndirty union {len(d1 | d2)}: both={len(both)} only-run1={len(only1)} only-run2={len(only2)}")

    for name in sorted(only1 | only2):
        src = "run1" if name in only1 else "run2"
        keep = rows2 if name in only1 else rows1
        kc = keep.get(name, {}).get("cpu_sec")
        print(f"  TRANSIENT  {name}: flagged in {src} only -> take the other run's cpu ({kc})")

    for name in sorted(both):
        c1 = rows1.get(name, {}).get("cpu_sec")
        c2 = rows2.get(name, {}).get("cpu_sec")
        s1 = rows1.get(name, {}).get("steal_pct")
        s2 = rows2.get(name, {}).get("steal_pct")
        r1 = rows1.get(name, {}).get("cpu_ratio") or rows2.get(name, {}).get("cpu_ratio")
        w1 = rows1.get(name, {}).get("wall_sec")
        w2 = rows2.get(name, {}).get("wall_sec")
        if c1 is None or c2 is None:
            print(f"  MISSING    {name}: not measured in both runs")
            continue
        agree = abs(c1 - c2) <= 0.25 * max(c1, c2)
        steal = max(x for x in (s1, s2, 0.0) if x is not None)
        if not agree:
            print(f"  UNSTABLE   {name}: cpu {c1} vs {c2} disagree >25% -> more reps before trusting either")
        elif steal >= 0.1:
            print(f"  AMBIENT    {name}: runs agree (cpu {c1}/{c2}, ratio {r1}) with material local steal "
                  f"({s1}/{s2}) -> host, not code")
        elif r1 is not None and r1 > 1.5 and wall_flat(name, rows1, rows2, r1):
            wr = max(r.get(name, {}).get("wall_ratio") or 0.0 for r in (rows1, rows2))
            print(f"  CO-TENANT  {name}: cpu {r1}x baseline but wall only {wr}x (walls {w1}/{w2} s) at "
                  f"near-zero steal -> shared-cache/bandwidth pressure, not code")
        else:
            print(f"  RE-PRICED  {name}: runs agree (cpu {c1}/{c2}, ratio {r1}) at near-zero steal, wall "
                  f"moving with cpu -> the old baseline row is the outlier, or the code changed "
                  f"(check src_sha / stale_queries)")


def wall_flat(name, rows1, rows2, cpu_ratio):
    """cpu inflated much more than wall: the co-tenant signature. Uses the
    wall_ratio the detail rows carry (since r11); details from older builds
    lack it -- then stay conservative and let the row fall to RE-PRICED.
    BOTH runs' wall_ratios must agree (the MAX decides): a single noisy
    wall measurement must not classify CO-TENANT on its own when the other
    run's wall moved with cpu -- that row falls to RE-PRICED instead."""
    wrs = [r.get(name, {}).get("wall_ratio") for r in (rows1, rows2)]
    wrs = [w for w in wrs if w is not None]
    if not wrs:
        return False
    return max(wrs) < 1.0 + 0.5 * (cpu_ratio - 1.0)


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2])
