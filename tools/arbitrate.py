#!/usr/bin/env python3
"""Isolated fresh-JVM arbitration of flagged scaling slopes (r16).

Every round since r13 has hand-run the same ritual: keys the full-run
bench pair flags as slope violations get re-measured ISOLATED — one
fresh JVM per key per scale via SPARK_GRAFT_ONLY (Bench's min-of-3
runs inside) — because a full 87-key sweep measures each key against a
JVM/page-cache state shaped by the 86 keys before it, and the sandbox's
co-tenant drift adds +/-25% on top (the r15 bench's embedded box-noise
probe measures exactly this).  Isolated minima are the steady-state
numbers the scaling verdicts actually cite.  This tool IS that ritual:

  python3 tools/arbitrate.py --keys dd_embedding,al_summary_rules
  python3 tools/arbitrate.py --from-pair BENCH_r16.json BENCH_sf1.json
  python3 tools/arbitrate.py --from-pair ... --out ARBITRATION_r16.json

--from-pair flags exactly what scaling.py's gate would: slope over the
key's limit (WAIVERS or DEFAULT_MAX_SLOPE) at >= MIN_SF1_SECONDS
absolute cost.  dd_embedding_anchor is ALWAYS arbitrated when present
in the pair (r15 verdict ask #5: the anchor exists for correctness,
not speed — its gate reading must be the isolated minimum, never a
warm-JVM full-sweep artifact).

Scales default to /root/testdata/sf0.1 and testdata-sf1 (the committed
pair).  Requires compiled classes (`sbt compile` first); each probe is
a plain `java -cp target/...:/opt/spark/jars/*` Bench run — fresh JVM,
no sbt startup tax.

Output: a markdown table plus an ARBITRATION json
({key: {a, b, slope, limit, verdict}}) that `scaling.py --check
--arbitration FILE` consults before failing a flagged key.
"""
import argparse
import hashlib
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling import WAIVERS, DEFAULT_MAX_SLOPE, MIN_SF1_SECONDS, load  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLASSES = os.path.join(REPO, "target", "scala-2.13", "classes")
SPARK_JARS = "/opt/spark/jars/*"

# build.sbt's jdk17AddOpens, verbatim — Spark 4.x on JDK 17 outside
# spark-submit needs these
ADD_OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]


def run_isolated(key, sf_dir, cpus="32"):
    """One fresh-JVM Bench probe of `key` at `sf_dir`; returns min-of-3
    seconds (Bench's own minimum), or None on failure."""
    cmd = ["java"]
    for p in ADD_OPENS:
        cmd += ["--add-opens", f"{p}=ALL-UNNAMED"]
    out = tempfile.mktemp(suffix=".json")
    cmd += [
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        f"-Xmx{os.environ.get('SPARK_DRIVER_MEM', '8g')}",
        "-cp", f"{CLASSES}:{SPARK_JARS}", "graft.Bench",
    ]
    env = dict(os.environ,
               SPARK_GRAFT_ONLY=key, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_BENCH_OUT=out, SPARK_GRAFT_CPUS=cpus,
               SPARK_GRAFT_RECALL="0", SPARK_GRAFT_INGEST="0")
    try:
        subprocess.run(cmd, env=env, check=True, timeout=3600,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        with open(out) as f:
            rec = json.load(f)
        os.unlink(out)
        t = rec["queries"].get(key, -1.0)
        return t if t >= 0 else None
    except (subprocess.SubprocessError, OSError, KeyError,
            json.JSONDecodeError) as e:
        print(f"  [arbitrate] {key} @ {sf_dir}: probe failed ({e})",
              file=sys.stderr)
        return None


def queries_fingerprint(queries):
    """Stable hash of a bench line's per-key block — the provenance an
    ARBITRATION file is bound to, so a stale file can never silently
    waive a regression measured on a DIFFERENT bench pair (r16 advice)."""
    return hashlib.sha256(
        json.dumps(queries, sort_keys=True).encode()).hexdigest()[:16]


def flag_from_pair(path_a, path_b):
    """The same flag rule as scaling.py's gate, plus the anchor."""
    a, b = load(path_a), load(path_b)
    qa, qb = a["queries"], b["queries"]
    keys = []
    for k in sorted(set(qa) & set(qb)):
        ta, tb = qa[k], qb[k]
        if ta <= 0 or tb < MIN_SF1_SECONDS:
            continue
        if tb / ta > WAIVERS.get(k, DEFAULT_MAX_SLOPE):
            keys.append(k)
    if "dd_embedding_anchor" in qa and "dd_embedding_anchor" in qb \
            and "dd_embedding_anchor" not in keys:
        keys.append("dd_embedding_anchor")
    return keys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", help="comma-separated key list to arbitrate")
    ap.add_argument("--from-pair", nargs=2, metavar=("BENCH_A", "BENCH_B"),
                    help="flag keys from a bench pair (scaling.py's rule)")
    ap.add_argument("--scale-a", default="/root/testdata/sf0.1")
    ap.add_argument("--scale-b", default=os.path.join(REPO, "testdata-sf1"))
    ap.add_argument("--out", default="ARBITRATION.json")
    args = ap.parse_args()

    keys = []
    pair = None
    if args.from_pair:
        keys = flag_from_pair(*args.from_pair)
        # bind this arbitration to the pair it arbitrates: paths plus a
        # fingerprint of each side's queries block, which scaling.py
        # verifies before applying any downgrade (a keys-only run emits
        # no binding and scaling.py warns it is unbound)
        pa, pb = (load(p) for p in args.from_pair)
        pair = {"paths": list(args.from_pair),
                "fingerprints": [queries_fingerprint(pa["queries"]),
                                 queries_fingerprint(pb["queries"])]}
    if args.keys:
        keys += [k for k in args.keys.split(",") if k and k not in keys]
    if not keys:
        print("nothing to arbitrate (no flagged keys)")
        # an EMPTY arbitration file is still a record: the gate read the
        # pair and found nothing to re-measure
        with open(args.out, "w") as f:
            json.dump({"scales": [args.scale_a, args.scale_b],
                       "pair": pair, "keys": {}}, f, indent=1)
        return
    if not os.path.isdir(CLASSES):
        raise SystemExit(f"{CLASSES} missing — run `sbt compile` first")

    print(f"arbitrating {len(keys)} key(s): {', '.join(keys)}")
    rows = {}
    for k in keys:
        ta = run_isolated(k, args.scale_a)
        tb = run_isolated(k, args.scale_b)
        limit = WAIVERS.get(k, DEFAULT_MAX_SLOPE)
        slope = (tb / ta) if (ta and tb and ta > 0) else None
        verdict = ("probe-failed" if slope is None else
                   "noise-exempt" if tb < MIN_SF1_SECONDS else
                   "ok" if slope <= limit else "over")
        rows[k] = {"a": ta, "b": tb, "slope": slope,
                   "limit": limit, "verdict": verdict}
        s = f"{slope:.2f}x" if slope is not None else "?"
        print(f"  {k}: {ta if ta is not None else '?'} -> "
              f"{tb if tb is not None else '?'} s, isolated slope {s} "
              f"(limit {limit:.1f}x) [{verdict}]")

    with open(args.out, "w") as f:
        json.dump({"scales": [args.scale_a, args.scale_b], "pair": pair,
                   "keys": rows}, f, indent=1)
    print(f"wrote {args.out}")
    if any(r["verdict"] in ("over", "probe-failed") for r in rows.values()):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
