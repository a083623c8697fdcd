#!/usr/bin/env python3
"""Re-pin BASELINE_QUERIES.json at schema v3 (r15 verdict ask 1b).

Input: >= 3 BENCH_VARIANCE-*.json artifacts PER CONFIG (clean runs of
the same code). Each run contributes one steady-state sample per
query: min(pass1, pass2), plus that winning pass's task-seconds. The
v3 pin is the triple
    [min over runs, median over runs, task-sec median over runs]
— the min is the old schema's tightest-draw value (kept for
reference/telemetry), the MEDIAN is what the gate multiplies (Bench
gates at 2 x median; bench_regress.py mirrors it), and the TASK
median is the work-flat bound: BenchGate excuses an over-threshold
wall only when task_sec stayed within 1.5 x this pin AND an
environmental co-witness is present (r15 advisor: a waiting-grew
plan regression is task-flat too, so the shape alone proves
nothing). Queries seen in some runs but not others (suite drift
mid-pinning) take the samples they have; a single-sample median is
that sample. Runs predating the task_sec column fall back to v2
pairs for the affected queries.

Usage:
  python3 tools/pin_baseline.py out.json run1.json run2.json ...
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
    def task(v):
        # quintuple is [sec, gc_ms, loadavg, task_sec, steal_ms]
        return v[3] if isinstance(v, list) and len(v) >= 5 else None
    # a throwing query records its fast-fail wall time in the passes
    # (only the errors map names it) — pinning that would poison the
    # min forever and flag every later HEALTHY run as a regression
    errors = d.get("errors") or {}
    p1 = {k: (sec(v), task(v)) for k, v in (d.get("pass1") or {}).items()
          if k not in errors}
    p2 = {k: (sec(v), task(v)) for k, v in (d.get("pass2") or {}).items()
          if k not in errors}
    merged = {}
    for k in set(p1) | set(p2):
        cands = [x for x in (p1.get(k), p2.get(k)) if x is not None]
        merged[k] = min(cands, key=lambda st: st[0])
    return d.get("config"), merged


def main():
    out_path, runs = sys.argv[1], sys.argv[2:]
    assert runs, "need at least one BENCH_VARIANCE artifact"
    by_cfg = {}
    for r in runs:
        cfg, m = steady(r)
        assert cfg, f"{r} carries no config stamp"
        by_cfg.setdefault(cfg, {})
        for q, st in m.items():
            by_cfg[cfg].setdefault(q, []).append(st)
    try:
        with open("BASELINE_QUERIES.json") as f:
            doc = json.load(f)
    except FileNotFoundError:
        doc = {"unit": "sec", "queries": {}}
    doc.setdefault("configs", {})
    for cfg, qs in by_cfg.items():
        n_runs = max(len(v) for v in qs.values())
        if n_runs < 3:
            print(f"WARN {cfg}: only {n_runs} runs — v3 medians want >= 3")
        table = {}
        for q, sts in sorted(qs.items()):
            walls = [st[0] for st in sts]
            tasks = [st[1] for st in sts if st[1] is not None]
            pin = [round(min(walls), 3),
                   round(statistics.median(walls), 3)]
            if tasks:
                pin.append(round(statistics.median(tasks), 3))
            table[q] = pin
        doc["configs"][cfg] = table
        print(f"{cfg}: pinned {len(qs)} queries from {n_runs} runs")
    doc["configs_source"] = (
        "schema v3 (r16): per query [min, median, task_sec median] of "
        f"min-of-passes over {len(runs)} clean runs; gate = 2 x median, "
        "task-flat excuse bound = 1.5 x task median + env co-witness "
        "(tools/pin_baseline.py)")
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
