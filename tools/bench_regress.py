#!/usr/bin/env python3
"""Per-query bench regression report (r11 verdict ask 7).

The driver gate compares TOTALS only, so a 10x regression in one query
hides inside a 258-query suite. This flags any query whose current
steady-state time exceeds its pinned threshold.

Baseline: BASELINE_QUERIES.json — {"source": ..., "unit": "sec",
"queries": {name: pin}, "configs": {"local[N]": {name: pin}}}.
A pin is either a bare number (schema v1: the per-query MIN over the
pinning runs, gated at 3x), a [min, median] pair (schema v2, r14
verdict ask 8: gated at 2 x MEDIAN — the min is one lucky scheduling
draw; the median is the typical clean run, and the pair records the
pin-time dispersion instead of discarding it), or a
[min, median, task_median] triple (schema v3, r15 verdict ask 1b:
same 2 x median wall gate; the task median feeds Bench's embedded
task-flat excuse — this tool's wall gate is unchanged by it).

Current run: a BENCH_VARIANCE-<cfg>-<epoch>.json (per-query MIN of
pass1/pass2 — see load_current) or a BENCH_FULL-*.json (flat
name->sec map). With no argument, uses BENCH_VARIANCE.json if present
(the committed round-close copy), else the NEWEST
bench_out/BENCH_VARIANCE-*.json (Bench >= r15 writes
config+timestamp-keyed files there so runs can't clobber each other).

Usage: python3 tools/bench_regress.py [current.json] [baseline.json]
Exit 1 if any query regressed past its threshold (new queries and
sub-100ms noise skipped). Steal-downgraded fails (Bench's embedded
"adjudication" object) are reported inline and do NOT fail the gate —
they are environmental-excuse suspects, never silent.
"""
import glob
import json
import os
import sys

FACTOR_V1 = 3.0  # x min pin (legacy schema)
FACTOR_V2 = 2.0  # x median pin (schema v2)
MIN_SEC = 0.15  # below this, scheduler noise dominates; not gradable


def default_current():
    """Newest artifact wins: a fresh bench_out run outranks the
    committed round-close copy at the repo root (which exists in any
    checked-out repo, so preferring it unconditionally would make a
    no-arg invocation silently grade the STALE blessed run and hide a
    fresh regression)."""
    cands = glob.glob("bench_out/BENCH_VARIANCE-*.json")
    if os.path.exists("BENCH_VARIANCE.json"):
        cands.append("BENCH_VARIANCE.json")
    if cands:
        return max(cands, key=os.path.getmtime)
    return "BENCH_VARIANCE.json"  # let open() fail with a clear path


def pin_threshold(node):
    """(reported_pin, threshold) from a v1 scalar or v2 [min, median]."""
    if isinstance(node, list) and len(node) >= 2:
        return (node[1], FACTOR_V2 * node[1], f"{FACTOR_V2}x median")
    return (node, FACTOR_V1 * node, f"{FACTOR_V1}x min")


def load_current(path):
    """Returns (times, errors, config, raw): a throwing query records
    a tiny fast-fail wall time, so the gate must read Bench's errors
    map — otherwise total breakage hides under MIN_SEC. `config` is
    the run's local[N] key (Bench >= r14 stamps it) so pins can be
    config-matched."""
    with open(path) as f:
        d = json.load(f)
    errors = d.get("errors") or {}
    if isinstance(errors, list):  # headline-line form: names only
        errors = {k: "failed" for k in errors}
    config = d.get("config")
    if "pass2" in d or "pass1" in d:
        # steady state = per-query MIN of the two passes (mirrors the
        # embedded gate): a hypervisor steal burst — visible in the
        # r14 steal_ms column — inflates whatever ran inside its
        # window in ONE pass; a genuine plan regression inflates both.
        def sec(v):
            return v[0] if isinstance(v, list) else v
        p1 = {k: sec(v) for k, v in (d.get("pass1") or {}).items()}
        p2 = {k: sec(v) for k, v in (d.get("pass2") or {}).items()}
        merged = {k: min(x for x in (p1.get(k), p2.get(k))
                         if x is not None)
                  for k in set(p1) | set(p2)}
        return (merged, errors, config, d)
    q = d.get("queries", d)
    return ({k: v for k, v in q.items()
             if isinstance(v, (int, float))}, errors, config, d)


def main():
    cur_path = sys.argv[1] if len(sys.argv) > 1 else default_current()
    base_path = sys.argv[2] if len(sys.argv) > 2 else "BASELINE_QUERIES.json"
    cur, errors, config, raw = load_current(cur_path)
    print(f"current: {cur_path}")
    with open(base_path) as f:
        base_doc = json.load(f)
    base = base_doc["queries"]
    # config-keyed pins (r13 verdict ask 1b): local[N] scheduling tax
    # is uniform but real, so a run stamped with a config whose pin
    # table exists is gated against THAT table (per-query fallback to
    # the legacy local[4] "queries" pins for queries not yet re-pinned
    # at this config).
    cfg_base = (base_doc.get("configs") or {}).get(config) or {}
    if cfg_base:
        print(f"using config-keyed pins for {config} "
              f"({len(cfg_base)} pinned, fallback to legacy table)")
    adjudication = raw.get("adjudication") or {}
    flagged, new, checked = [], [], 0
    for name, msg in sorted(errors.items()):
        print(f"FAILED {name}: {msg}")
    for name, sec in sorted(cur.items()):
        if name == "memo_build" or name in errors:
            continue
        if name not in cfg_base and name not in base:
            new.append(name)
            continue
        checked += 1
        node = cfg_base.get(name, base.get(name))
        pinned, thr, rule = pin_threshold(node)
        if name in adjudication:
            # Bench's embedded steal-aware gate already downgraded
            # this fail (r14 verdict ask 1); report the excuse inline
            print(f"DOWNGRADED {name}: {sec:.3f}s vs pinned "
                  f"{pinned:.3f}s — {adjudication[name]}")
            continue
        if sec >= MIN_SEC and pinned > 0 and sec > thr:
            flagged.append((name, pinned, sec, sec / pinned, rule))
    for name, pinned, sec, ratio, rule in flagged:
        # adjudication telemetry: the quintuple is
        # [sec, gc_ms, loadavg, task_sec, steal_ms] — steal elevated
        # in BOTH passes says the host, task grown with steal flat
        # says the plan
        tel = " ".join(
            f"{p}={raw[p].get(name)}" for p in ("pass1", "pass2")
            if isinstance(raw.get(p), dict) and name in raw[p])
        print(f"REGRESSED {name}: {sec:.3f}s vs pinned {pinned:.3f}s "
              f"({ratio:.1f}x, rule {rule}) {tel}")
    # non-fatal: Bench's embedded "suspect" list — slower pass over
    # the factor with NO steal excuse while the min stayed under; the
    # explicit adjudication queue for in-JVM pass-2-only degradation
    for name, pair in sorted((raw.get("suspect") or {}).items()):
        if name in adjudication:
            continue  # already reported as DOWNGRADED above — Bench
            # emits excused fails into BOTH objects
        print(f"SUSPECT {name}: slow pass {pair[1]:.3f}s vs pinned "
              f"{pair[0]:.3f}s (min-of-passes under factor)")
    if new:
        print(f"note: {len(new)} queries have no pinned baseline yet: "
              + ", ".join(new[:8]) + ("..." if len(new) > 8 else ""))
    print(f"== {checked} checked, {len(flagged)} regressed, "
          f"{len(adjudication)} downgraded, {len(errors)} failed "
          f"(floor {MIN_SEC}s) ==")
    sys.exit(1 if (flagged or errors) else 0)


if __name__ == "__main__":
    main()
