#!/usr/bin/env python3
"""Re-pin BASELINE_QUERIES.json at schema v2 (r14 verdict ask 8).

Input: >= 3 BENCH_VARIANCE-*.json artifacts PER CONFIG (clean runs of
the same code). Each run contributes one steady-state sample per
query: min(pass1, pass2). The v2 pin is the pair
    [min over runs, median over runs]
— the min is the old schema's tightest-draw value (kept for
reference/telemetry), the MEDIAN is what the gate multiplies
(Bench gates at 2 x median; bench_regress.py mirrors it). Queries
seen in some runs but not others (suite drift mid-pinning) take the
samples they have; a single-sample median is that sample.

Usage:
  python3 tools/pin_baseline.py out.json run1.json run2.json run3.json ...
Runs may mix configs; each is keyed by its embedded "config" field.
The output file preserves the existing top-level "queries" legacy
table and metadata of BASELINE_QUERIES.json if present in cwd, and
replaces "configs" entries for configs that got new samples.
"""
import json
import statistics
import sys


def steady(path):
    with open(path) as f:
        d = json.load(f)
    def sec(v):
        return v[0] if isinstance(v, list) else v
    # a throwing query records its fast-fail wall time in the passes
    # (only the errors map names it) — pinning that would poison the
    # min forever and flag every later HEALTHY run as a regression
    errors = d.get("errors") or {}
    p1 = {k: sec(v) for k, v in (d.get("pass1") or {}).items()
          if k not in errors}
    p2 = {k: sec(v) for k, v in (d.get("pass2") or {}).items()
          if k not in errors}
    merged = {k: min(x for x in (p1.get(k), p2.get(k)) if x is not None)
              for k in set(p1) | set(p2)}
    return d.get("config"), merged


def main():
    out_path, runs = sys.argv[1], sys.argv[2:]
    assert runs, "need at least one BENCH_VARIANCE artifact"
    by_cfg = {}
    for r in runs:
        cfg, m = steady(r)
        assert cfg, f"{r} carries no config stamp"
        by_cfg.setdefault(cfg, {})
        for q, s in m.items():
            by_cfg[cfg].setdefault(q, []).append(s)
    try:
        with open("BASELINE_QUERIES.json") as f:
            doc = json.load(f)
    except FileNotFoundError:
        doc = {"unit": "sec", "queries": {}}
    doc.setdefault("configs", {})
    for cfg, qs in by_cfg.items():
        n_runs = max(len(v) for v in qs.values())
        if n_runs < 3:
            print(f"WARN {cfg}: only {n_runs} runs — v2 medians want >= 3")
        doc["configs"][cfg] = {
            q: [round(min(v), 3), round(statistics.median(v), 3)]
            for q, v in sorted(qs.items())}
        print(f"{cfg}: pinned {len(qs)} queries from {n_runs} runs")
    doc["configs_source"] = (
        "schema v2 (r15): per query [min, median] of min-of-passes over "
        f"{len(runs)} clean runs; gate = 2 x median "
        "(tools/pin_baseline.py)")
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
