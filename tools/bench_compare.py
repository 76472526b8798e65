#!/usr/bin/env python3
"""Adjudicate a bench artifact against a reference run: uniform drift
vs plan regression (the r7/r14/r15 question, made a one-command check).

Usage: python3 tools/bench_compare.py <reference.json|log> <candidate.json|log>

Accepts either a raw Bench JSON line, a file containing one (driver
BENCH_r{N}.json, BENCH_full_r{N}.json, BENCH_local.json, or an sbt
log), or the driver's truncated {"tail": ...} wrapper (per-query
entries recovered by regex). When a path matches BENCH_r{N}.json and a
sibling BENCH_full_r{N}.json exists, the FULL map is used instead —
the driver wrapper keeps only an alphabetic tail (~61 of 240 queries),
and adjudicating from a partial map produced a false plan-regression
flag in r15 (text_langid read 4.3x from the tail while the same-HEAD
full map read flat).

Reads printed:
- totals + canary start/end (contention fingerprint, present since r15)
- median per-query ratio on common queries = the UNIFORM drift factor
- the CANARY drift normalizer: rel_q6(cand)/rel_q6(ref) from the maps
  (rel_q6 is the designated canary query, so every full map carries an
  implicit canary even for pre-r15 artifacts) and the residual
  median-ratio/canary-drift — plan-level change net of box drift
- queries whose ratio exceeds 3x the median = suspected PLAN
  regressions (uniform VM slowdown cannot single them out)
- the drift-normalized 2x-gate read (BASELINE.md round-16 protocol):
  raw = (cand_total/n)/V1_SPQ; normalized = raw / (rel_q6_cand /
  V1_ERA_REL_Q6). The anchor V1_ERA_REL_Q6 derives from the r15 full
  map (rel_q6 = 0.2296 s) divided by the measured 1.28x r13->r15
  uniform drift, r13 being the 1.00x-of-v1 era (BASELINE.md r13/r15
  records).

Verdict heuristic: a contended/slower box moves the MEDIAN (and the
canary with it); a real plan regression moves specific queries far
off it.
"""
import json
import os
import re
import statistics
import sys

V1_SPQ = 35.0 / 53.0          # v1 baseline: 35 s / 53 queries (BASELINE.md)
V1_ERA_REL_Q6 = 0.2296 / 1.28  # r15 rel_q6 / measured r13->r15 drift


def prefer_full(path):
    """BENCH_r{N}.json -> sibling BENCH_full_r{N}.json when present."""
    m = re.match(r"(.*)BENCH_r(\d+)\.json$", path)
    if m:
        full = f"{m.group(1)}BENCH_full_r{m.group(2)}.json"
        if os.path.exists(full):
            print(f"note: using full map {full} instead of truncated {path}")
            return full
    return path


def load(path):
    raw = open(path, errors="ignore").read()
    # driver-wrapper fingerprint (ADVICE/verdict r16): an artifact whose
    # outer object carries "n"/"rc" came from the driver's own capture
    # wrapper — those runs execute while sbt test/compile may share the
    # box, and r15/r16 both saw such maps read 3-4x on heavy queries.
    # Adjudicate ONLY from the canary/residual, never record as headline.
    if re.search(r'"n"\s*:\s*\d+', raw[:200]) and re.search(r'"rc"\s*:', raw[:200]):
        print(f"WARNING: {path} is a driver-wrapper capture (n/rc keys) — "
              "it may have run concurrently with sbt; do NOT treat it as an "
              "exclusive headline, adjudicate via canary + residual only")
    i = raw.rfind('{"queries"')
    if i >= 0:
        line = raw[i:]
        # cut at the end of the bench line if more output follows; a
        # line missing its trailing newline parses as-is below
        j = line.find("}\n")
        if j >= 0:
            line = line[: j + 1]
        try:
            d = json.loads(line.strip().rstrip("`"))
            return (d["queries"], d.get("value"), d.get("canary"),
                    str(d.get("sf", "")))
        except json.JSONDecodeError:
            pass
    # driver wrapper / truncated tail: regex-recover per-query entries
    # \\? : driver wrappers carry the bench line as an escaped JSON
    # string ("tail": "...\"q1\":1.23..."), so quotes may be preceded
    # by a backslash; -? : failed queries are recorded as -1.0 and must
    # surface in the FAILED check, not silently drop (ADVICE r15)
    qs = {
        m.group(1): float(m.group(2))
        for m in re.finditer(r'"([a-z][a-z0-9_]+)\\?":(-?[0-9][0-9.]*)', raw)
        if m.group(1) not in ("value", "n_queries", "n", "rc", "cpus", "sf",
                              "start_sec", "mid_sec", "end_sec")
    }
    mval = re.search(r'"value":(-?[0-9.]+)', raw)
    msf = re.search(r'"sf":\s*"?([^,"}]+)', raw)
    return (qs, float(mval.group(1)) if mval else None, None,
            msf.group(1) if msf else "")


def canary_legs(canary):
    """All positive probe samples — start/mid/end (mid since r17)."""
    if not canary:
        return []
    return [v for v in (canary.get("start_sec"), canary.get("mid_sec"),
                        canary.get("end_sec")) if v and v > 0]


def canary_read(qs, canary):
    """Best quiet-box rel_q6 read: the map entry (min of the two timed
    passes) when present, else the smallest canary probe sample."""
    if qs.get("rel_q6", -1) > 0:
        return qs["rel_q6"]
    legs = canary_legs(canary)
    return min(legs) if legs else None


def main():
    ref_path, cand_path = prefer_full(sys.argv[1]), prefer_full(sys.argv[2])
    ref, ref_total, ref_canary, _ = load(ref_path)
    cand, cand_total, cand_canary, cand_sf = load(cand_path)
    print(f"reference: {len(ref)} queries, total={ref_total}, canary={ref_canary}")
    print(f"candidate: {len(cand)} queries, total={cand_total}, canary={cand_canary}")
    legs = canary_legs(cand_canary)
    if len(legs) >= 2:
        # three samples since r17 (start/mid/end): the contention
        # fingerprint is a LATER sample well above an earlier one; a high
        # start with mid ~= end is post-warm-up settling, not contention
        spread = max(legs) / min(legs)
        later_over_first = max(legs[1:]) / legs[0]
        tag = ("QUIET" if later_over_first < 1.5 else "DEGRADING MID-RUN")
        print(f"candidate canary samples {[round(v, 3) for v in legs]} "
              f"spread {spread:.2f}x, later/first {later_over_first:.2f} "
              f"-> box {tag}")
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
    # drift-normalized gate read, independent of the reference artifact;
    # the v1 anchor is an sf0.1 number, so only sf0.1 maps gate
    cq = canary_read(cand, cand_canary)
    if cand_total and cand_total > 0 and len(cand) > 60 and cq:
        # positive sf0.1 evidence required (ADVICE r16): the v1 anchor is
        # an sf0.1 number, so an artifact with UNKNOWN sf must not print
        # an authoritative gate read
        if "sf0.1" in cand_sf or cand_sf == "0.1":
            spq = cand_total / len(cand)
            raw_gate = spq / V1_SPQ
            drift = cq / V1_ERA_REL_Q6
            print(f"2x-gate read: raw {spq:.3f} s/q = {raw_gate:.2f}x v1; "
                  f"canary drift {drift:.2f}x (rel_q6 {cq:.3f}s vs v1-era "
                  f"{V1_ERA_REL_Q6:.4f}s) -> drift-normalized {raw_gate / drift:.2f}x")
        elif not cand_sf:
            print("2x-gate read SKIPPED: candidate artifact carries no sf "
                  "field — the v1 anchor is sf0.1-only; re-run with a map "
                  "that records its sf")
    if not common:
        print("no common queries to compare")
        return
    ratios = {k: cand[k] / ref[k] for k in common}
    med = statistics.median(ratios.values())
    print(f"median per-query ratio on {len(common)} common queries: {med:.3f}"
          " (the uniform drift factor)")
    rq = canary_read(ref, ref_canary)
    if rq and cq:
        print(f"canary drift rel_q6 {rq:.3f} -> {cq:.3f} = {cq / rq:.3f}x; "
              f"median-ratio residual net of canary = {med / (cq / rq):.3f}")
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
