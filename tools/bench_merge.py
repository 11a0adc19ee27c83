#!/usr/bin/env python3
"""Merge N full Bench runs into ONE committed artifact whose headline
is the per-query MEDIAN across repeats — with every repeat embedded,
so post-hoc selection of a favorable run is structurally impossible
(VERDICT r11 finding 2: committing the faster of two sf1 repeats
biases every round-over-round comparison downward).

Usage: python3 tools/bench_merge.py out.json run1.json run2.json [...]

Each input is a Bench detail JSON (BENCH_DETAIL.json shape: top-level
"queries" / "plan_fp" / "sf" / ...). The output carries, in order:

  {"stat": "median_of_repeats", "n_repeats": N,
   "value": <sum of per-query medians>,
   "queries": {<name>: <median across repeats>},
   "plan_fp": {<name>: <fingerprint>},   # must agree across repeats
   "sf": "...",
   "repeats": [<each input verbatim, chronological>]}

"queries" precedes "repeats" on purpose: ContractSpec's flat-object
extractor reads the FIRST "queries" block, so the drift check always
sees the median, never a single repeat. Plan fingerprints must be
identical across repeats (same code, same data) — a mismatch aborts
the merge instead of averaging across different plans.
"""
import json
import statistics
import sys


def main():
    if len(sys.argv) < 4:
        sys.exit("need an output path and >= 2 repeat files "
                 "(a single run needs no merge)")
    out, ins = sys.argv[1], sys.argv[2:]
    runs = [json.load(open(p)) for p in ins]
    sfs = {r.get("sf") for r in runs}
    if len(sfs) != 1:
        sys.exit(f"repeats span different SFs: {sfs}")
    names = set()
    for r in runs:
        names |= set(r.get("queries", {}))
    medians = {}
    for n in sorted(names):
        vals = [r["queries"][n] for r in runs
                if n in r.get("queries", {}) and r["queries"][n] >= 0]
        medians[n] = statistics.median(vals) if vals else -1
    fps = {}
    for n in sorted(names):
        seen = {r.get("plan_fp", {}).get(n) for r in runs} - {None}
        if len(seen) > 1:
            sys.exit(f"plan fingerprint for {n} differs across repeats: "
                     f"{seen} — not the same code/data, refusing to merge")
        if seen:
            fps[n] = seen.pop()
    total = sum(v for v in medians.values() if v >= 0)
    artifact = {
        "stat": "median_of_repeats",
        "n_repeats": len(runs),
        "metric": "total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": medians,
        "plan_fp": fps,
        "sf": sfs.pop(),
        "repeats": runs,
    }
    with open(out, "w") as f:
        # compact separators: ContractSpec's flat extractor matches the
        # exact token '"queries":{' the bench itself writes
        json.dump(artifact, f, separators=(",", ":"))
    print(f"wrote {out}: {len(runs)} repeats, {len(medians)} queries, "
          f"median total {artifact['value']}s "
          f"(repeat totals: {[round(r.get('value', -1), 1) for r in runs]})")


if __name__ == "__main__":
    main()
