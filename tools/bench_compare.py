#!/usr/bin/env python3
"""Adjudicate a bench artifact against a reference run: uniform drift
vs plan regression (the r7/r14/r15 question, made a one-command check).

Usage: python3 tools/bench_compare.py <reference.json|log> <candidate.json|log>

Accepts either a raw Bench JSON line, a file containing one (driver
BENCH_r{N}.json, BENCH_local.json, or an sbt log), or the driver's
truncated {"tail": ...} wrapper (per-query entries recovered by regex).

Reads printed:
- totals + canary start/end (contention fingerprint, present since r15)
- median per-query ratio on common queries = the UNIFORM drift factor
- queries whose ratio exceeds 3x the median = suspected PLAN
  regressions (uniform VM slowdown cannot single them out)

Verdict heuristic: a contended/slower box moves the MEDIAN; a real
plan regression moves specific queries far off it.
"""
import json
import re
import statistics
import sys


def load(path):
    raw = open(path, errors="ignore").read()
    i = raw.rfind('{"queries"')
    if i >= 0:
        line = raw[i:]
        line = line[: line.index("}\n") + 1] if "}\n" in line else line
        try:
            d = json.loads(line.strip().rstrip("`"))
            return d["queries"], d.get("value"), d.get("canary")
        except json.JSONDecodeError:
            pass
    # driver wrapper / truncated tail: regex-recover per-query entries
    # \\? : driver wrappers carry the bench line as an escaped JSON
    # string ("tail": "...\"q1\":1.23..."), so quotes may be preceded
    # by a backslash
    qs = {
        m.group(1): float(m.group(2))
        for m in re.finditer(r'"([a-z][a-z0-9_]+)\\?":([0-9][0-9.]*)', raw)
        if m.group(1) not in ("value", "n_queries", "n", "rc", "cpus", "sf",
                              "start_sec", "end_sec")
    }
    mval = re.search(r'"value":([0-9.]+)', raw)
    return qs, float(mval.group(1)) if mval else None, None


def main():
    ref_path, cand_path = sys.argv[1], sys.argv[2]
    ref, ref_total, ref_canary = load(ref_path)
    cand, cand_total, cand_canary = load(cand_path)
    print(f"reference: {len(ref)} queries, total={ref_total}, canary={ref_canary}")
    print(f"candidate: {len(cand)} queries, total={cand_total}, canary={cand_canary}")
    if cand_canary:
        s, e = cand_canary.get("start_sec"), cand_canary.get("end_sec")
        if s and e and s > 0:
            tag = "QUIET" if e / s < 1.5 else "DEGRADING MID-RUN"
            print(f"candidate canary ratio end/start = {e / s:.2f} -> box {tag}")
    common = [k for k in ref if k in cand and ref[k] > 0 and cand[k] > 0]
    new = sorted((k for k in cand if k not in ref),
                 key=lambda k: -cand[k])
    if new:
        shown = ", ".join(f"{k}={cand[k]:.2f}s" for k in new[:12])
        more = f" … +{len(new) - 12} more" if len(new) > 12 else ""
        print(f"new-in-candidate ({len(new)}, heaviest first): {shown}{more}")
    failed = sorted(k for k in cand if cand[k] < 0)
    if failed:
        print(f"FAILED in candidate: {failed}")
    if not common:
        print("no common queries to compare")
        return
    ratios = {k: cand[k] / ref[k] for k in common}
    med = statistics.median(ratios.values())
    print(f"median per-query ratio on {len(common)} common queries: {med:.3f}"
          " (the uniform drift factor)")
    sus = sorted(((r, k) for k, r in ratios.items() if r > 3 * med),
                 reverse=True)
    if sus:
        print("suspected PLAN regressions (ratio > 3x median):")
        for r, k in sus:
            print(f"  {k}: {ref[k]:.2f} -> {cand[k]:.2f} s ({r:.1f}x)")
    else:
        print("no query exceeds 3x the median ratio -> no plan regression"
              " signature; any total delta is uniform drift + new queries")


if __name__ == "__main__":
    main()
