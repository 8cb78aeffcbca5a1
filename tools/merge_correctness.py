#!/usr/bin/env python3
"""Merge per-key/per-batch check.py --json outputs into one CORRECTNESS
record (NOT part of the library).

Usage: python3 tools/merge_correctness.py OUT.json IN1.json [IN2.json ...]

Later inputs win on key collisions (so a re-run of a single key can be
appended after a batch file). Exits 1 if any merged record is red
(rows/schema mismatch or an err), mirroring check.py's gate, and prints
the per-key verdict summary. The sf1 gate needs this because the heavy
dd_* DuckDB twins run as parallel per-key processes (60+ min each)
while the other ~76 keys run in one quick pass.
"""
import json
import sys


def main(out, ins):
    merged = {}
    for path in ins:
        with open(path) as f:
            merged.update(json.load(f))
    def is_red(v):
        # no-oracle (rows-only) records carry no schema contract:
        # oracle_rows is None and pre-r18 check.py left schema_match at
        # its False default even when green — they are red only when
        # the rows check itself failed or the read errored (r18
        # advisor fix; r18 check.py also sets schema_match=True and
        # counts 0-row rows-only results as failures, so the two gates
        # agree in both directions on both old and new record files)
        if v.get("oracle_rows") is None:
            return bool(v.get("err")) or not v.get("rows_match")
        return bool(v.get("err")) or not (v.get("rows_match")
                                          and v.get("schema_match"))

    red = sorted(k for k, v in merged.items() if is_red(v))
    green = sorted(k for k in merged if k not in red)
    hash_green = [k for k in green if merged[k].get("hash_match")]
    with open(out, "w") as f:
        json.dump(merged, f, indent=4, sort_keys=True)
    print(f"merged {len(ins)} file(s) -> {out}: {len(merged)} keys, "
          f"{len(green)} green ({len(hash_green)} hash-exact), "
          f"{len(red)} red")
    if red:
        for k in red:
            print(f"  RED {k}: {merged[k]}")
    return 1 if red else 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    sys.exit(main(sys.argv[1], sys.argv[2:]))
