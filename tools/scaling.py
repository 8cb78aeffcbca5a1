#!/usr/bin/env python3
"""Per-key scaling slopes between two bench JSON lines (sf0.1 vs sf1).

Usage: python3 tools/scaling.py BENCH_sf01.json BENCH_sf1.json

Each input is either a raw one-line bench JSON ({"metric":...,"queries":
{...}}) or a driver wrapper with a "tail" field containing that line.
Prints a markdown table of per-key times and the sf1/sf0.1 slope,
sorted by slope descending, plus the ingest/recall blocks if present.
"""
import json
import sys


def load(path):
    with open(path) as f:
        raw = f.read()
    try:
        d = json.loads(raw)
        if isinstance(d, dict) and "queries" in d:
            return d
        if isinstance(d, dict) and "tail" in d:
            raw = d["tail"]
    except json.JSONDecodeError:
        pass
    # find the bench line inside arbitrary log text
    for line in raw.splitlines():
        i = line.find('{"metric"')
        if i >= 0:
            return json.loads(line[i:])
    raise SystemExit(f"no bench JSON line found in {path}")


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    qa, qb = a["queries"], b["queries"]
    keys = sorted(set(qa) & set(qb))
    rows = []
    for k in keys:
        ta, tb = qa[k], qb[k]
        slope = tb / ta if ta > 0 else float("inf")
        rows.append((slope, k, ta, tb))
    rows.sort(reverse=True)
    print("| key | sf0.1 s | sf1 s | slope (sf1/sf0.1) |")
    print("|---|---|---|---|")
    for slope, k, ta, tb in rows:
        print(f"| {k} | {ta:.2f} | {tb:.2f} | {slope:.1f}x |")
    ta_tot = sum(t for t in qa.values() if t >= 0)
    tb_tot = sum(t for t in qb.values() if t >= 0)
    print(f"\ntotals: sf0.1 {ta_tot:.1f}s, sf1 {tb_tot:.1f}s, "
          f"overall slope {tb_tot / ta_tot:.2f}x at 10x data")
    for blk in ("recall", "ingest"):
        for name, d in (("sf0.1", a), ("sf1", b)):
            if blk in d:
                print(f"{blk} @ {name}: {json.dumps(d[blk])}")


if __name__ == "__main__":
    main()
