#!/usr/bin/env python3
"""Run-shape bench adjudication — the PERF.md protocol, automated.

Usage:
  python3 tools/benchadj.py <old_bench.json> <new_bench.json>
      [--threshold 1.25] [--query q_name ...] [--all]

Accepts either the driver's BENCH_r{N}.json wrapper ({"tail": "..."})
or a file whose content contains the raw one-line bench JSON emitted by
graft.Bench. Applies the adjudication rule hand-computed in PERF.md
since r14:

  * compare IN-SUITE MINIMA only (`queries_min`; falls back to
    `queries` for single-repeat runs) — first-run readings carry cold
    JIT/cache noise;
  * sentinel-normalize ONE-SIDED: the sentinel (`sentinel.first`) is
    the fixed tiny query that prices a run's ambient machine load, so a
    uniformly-SLOW new run is discounted by the sentinel ratio — but a
    run whose sentinel IMPROVED gets no inflation credit (absolute
    minima already tell the truth there):
        ratio = (new_min / old_min) / max(1, new_sentinel / old_sentinel)
  * flag ratios above --threshold (default 1.25, the PERF.md drift
    line); a run whose own line says interference:true is refused
    outright (the rule: discard and re-run).

Output: one markdown table (paste-ready for PERF.md) + a verdict line
per flagged query. Exit 2 on interference, 1 if any query flags, else 0.
"""
import argparse
import json
import re
import sys


def load_bench(path: str) -> dict:
    text = open(path).read()
    try:
        wrapper = json.loads(text)
        if isinstance(wrapper, dict) and "tail" in wrapper:
            text = wrapper["tail"]
        elif isinstance(wrapper, dict) and "metric" in wrapper:
            return wrapper
    except json.JSONDecodeError:
        pass
    # newest bench line wins; per line try the greedy to-EOL form first,
    # then the non-greedy inline form. A candidate truncated by a '} '
    # inside a string value fails json.loads and falls through instead
    # of crashing the adjudication on it.
    lines = [ln for ln in text.splitlines() if '{"metric":"total"' in ln]
    for ln in reversed(lines):
        seg = ln[ln.index('{"metric":"total"'):].strip()
        m = re.match(r'\{"metric":"total".*?\}(?=\s|$)', seg)
        for cand in ([seg] + ([m.group(0)] if m else [])):
            try:
                return json.loads(cand)
            except json.JSONDecodeError:
                continue
    sys.exit(f"benchadj: no bench JSON line found in {path}")


def minima(bench: dict) -> dict:
    qs = bench.get("queries_min") or bench.get("queries") or {}
    return {k: float(v) for k, v in qs.items()}


def sentinel_of(bench: dict, path: str) -> float:
    s = bench.get("sentinel")
    if isinstance(s, dict):
        v = s.get("first")
    else:
        v = s
    if not v or float(v) <= 0:
        sys.exit(f"benchadj: {path} has no usable sentinel reading")
    return float(v)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.25)
    ap.add_argument("--query", action="append", default=[],
                    help="restrict to these queries (repeatable)")
    ap.add_argument("--all", action="store_true",
                    help="print every shared query, not just flagged ones")
    args = ap.parse_args()

    old = load_bench(args.old)
    new = load_bench(args.new)
    for b, p in ((old, args.old), (new, args.new)):
        if b.get("interference"):
            print(f"REFUSED: {p} says interference:true — "
                  "discard the run and re-measure (run-shape rule)")
            return 2

    so, sn = sentinel_of(old, args.old), sentinel_of(new, args.new)
    mo, mn = minima(old), minima(new)
    shared = sorted(set(mo) & set(mn))
    if args.query:
        missing = [q for q in args.query if q not in shared]
        if missing:
            sys.exit(f"benchadj: not in both runs: {', '.join(missing)}")
        shared = [q for q in shared if q in set(args.query)]

    # one-sided ambient discount: only a WORSE new sentinel excuses slowness
    discount = max(1.0, sn / so)
    rows = []
    for q in shared:
        raw = mn[q] / mo[q] if mo[q] > 0 else float("inf")
        rows.append((q, mo[q], mn[q], raw, raw / discount))
    rows.sort(key=lambda r: -r[4])
    flagged = [r for r in rows if r[4] > args.threshold]

    print(f"old: {args.old} sentinel {so:.3f} | "
          f"new: {args.new} sentinel {sn:.3f} | "
          f"ambient discount {discount:.2f}x | "
          f"threshold {args.threshold}x")
    print("| query | old min | new min | raw ratio | adjudicated |")
    print("|---|---|---|---|---|")
    for q, a, b, raw, adj in (rows if args.all else flagged) or rows[:1]:
        print(f"| {q} | {a:.3f} | {b:.3f} | {raw:.2f}x | {adj:.2f}x |")
    if flagged:
        print(f"\nFLAGGED ({len(flagged)} > {args.threshold}x normalized): "
              + ", ".join(r[0] for r in flagged))
        print("next: one quiet full-suite protocol run on the flagged "
              "gates; record the adjudication (machine-floor or "
              "found-and-fixed) in PERF.md")
        return 1
    print("\nno drift above threshold — parity within the run-shape envelope")
    return 0


if __name__ == "__main__":
    sys.exit(main())
