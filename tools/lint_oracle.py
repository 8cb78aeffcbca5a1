#!/usr/bin/env python3
"""Determinism lint over the RENDERED oracle SQL (r19, verdict ask #5).

The three r18 divergence classes are documented in SURVEY.md §4 and
fixed in source, but nothing guarded against REINTRODUCTION: a new key
with a direct decimal->double cast on an unbounded aggregate passes
sf0.01/sf0.1 (values under 2^53) and diverges only at sf1+, exactly
like q_pricing_summary did in r17. This lint makes two of the three
rules mechanical (the third — integer threshold tables for float
schedule boundaries — has no syntactic signature and stays a spec
concern, Dedup.PlaneThresholds / AnnLsh.autoPlanes property tests):

  Rule A (decimal->double double-rounding): CAST(SUM|AVG(<expr over a
    DECIMAL column>) AS DOUBLE) without a VARCHAR hop inside the
    aggregate's cast chain. The deterministic form is
    CAST(CAST(sum(x) AS VARCHAR) AS DOUBLE) — one correctly-rounded
    string->double on both engines at any magnitude. Spark-side twin
    rule (ExactCast.decToDouble) is enforced semantically by
    PlanQualitySpec's analyzed-plan walk.

  Rule B (char-vs-byte digests): md5() over a raw char slice of the
    document payload — md5(substring(text, ...)) or
    md5(encode(substring(text, ...))) — byte windows can split
    multi-byte chars, so frame digests must hash the window's HEX
    rendering (md5(substring(hex(encode(text)), 2*off+1, 2*len))),
    never a VARCHAR slice.

Usage:
  sbt 'runMain graft.Verify ignored OUT' with SPARK_GRAFT_SQL_ONLY=1
  python3 tools/lint_oracle.py OUT/oracle_sql.json
  python3 tools/lint_oracle.py --self-test   # planted violations must go red

Exit 0 = clean, 1 = violations (or a self-test failure).
"""
import json
import re
import sys

# The DECIMAL columns of the driver's parquet tables (TESTDATA.md); the
# events/documents/embeddings domain tables carry no decimals, so an
# aggregate is "decimal" exactly when its argument references one of
# these. Keep in sync with the TPC-H-ish schema.
DECIMAL_COLS = {
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "o_totalprice", "ps_supplycost", "c_acctbal", "s_acctbal",
    "p_retailprice",
}

_WORD = re.compile(r"[a-z_][a-z0-9_]*", re.IGNORECASE)


def _balanced(s: str, open_idx: int) -> int:
    """Index just past the ')' matching the '(' at open_idx (-1 if
    unbalanced). Quotes are honored so parens inside string literals
    don't count."""
    depth, i, n = 0, open_idx, len(s)
    while i < n:
        c = s[i]
        if c == "'":
            i += 1
            while i < n and s[i] != "'":
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return -1


def lint_decimal_cast(sql: str):
    """Rule A hits: list of offending CAST(...) snippets."""
    hits = []
    for m in re.finditer(r"CAST\s*\(\s*(SUM|AVG)\s*\(", sql, re.IGNORECASE):
        agg_open = sql.index("(", m.end() - 1)
        agg_end = _balanced(sql, agg_open)
        if agg_end < 0:
            continue
        arg = sql[agg_open:agg_end]
        tail = sql[agg_end:agg_end + 40]
        if not re.match(r"\s*AS\s+DOUBLE\b", tail, re.IGNORECASE):
            continue
        cols = {w.lower() for w in _WORD.findall(arg)}
        if cols & DECIMAL_COLS and not re.search(
                r"AS\s+VARCHAR", arg, re.IGNORECASE):
            snippet = re.sub(r"\s+", " ", sql[m.start():agg_end + 10])
            hits.append(snippet[:100])
    return hits


def lint_char_slice_digest(sql: str):
    """Rule B hits: md5 of a raw char slice of the payload column."""
    hits = []
    for m in re.finditer(
            r"md5\s*\(\s*(?:encode\s*\(\s*)?substring\s*\(\s*text\b",
            sql, re.IGNORECASE):
        snippet = re.sub(r"\s+", " ", sql[m.start():m.start() + 80])
        hits.append(snippet)
    return hits


def lint(oracle: dict):
    violations = []
    for key in sorted(oracle):
        sql = oracle[key]
        for hit in lint_decimal_cast(sql):
            violations.append(
                (key, "decimal-cast", f"direct decimal aggregate -> "
                 f"DOUBLE (double-rounds in DuckDB past 2^53; route "
                 f"through CAST(... AS VARCHAR)): {hit}"))
        for hit in lint_char_slice_digest(sql):
            violations.append(
                (key, "char-slice-digest", f"md5 over a raw char slice "
                 f"of the payload (byte windows split multi-byte chars; "
                 f"hash the hex rendering instead): {hit}"))
    return violations


def self_test() -> int:
    clean = {
        # the decToDouble form — VARCHAR hop inside the cast chain
        "good_sum": "SELECT CAST(CAST(SUM(l_extendedprice * (1 - "
                    "l_discount)) AS VARCHAR) AS DOUBLE) FROM lineitem",
        # direct cast over a NON-decimal aggregate is fine
        "good_count": "SELECT CAST(SUM(n_tokens) AS DOUBLE) FROM docs",
        # bounded-window decimal sums keep the direct cast by contract —
        # the window form never matches CAST(SUM( ... ) AS DOUBLE)
        # because OVER sits between the paren and AS
        "good_window": "SELECT CAST(SUM(l_quantity) OVER (PARTITION BY "
                       "l_suppkey ORDER BY l_shipdate ROWS BETWEEN 23 "
                       "PRECEDING AND CURRENT ROW) AS DOUBLE) "
                       "FROM lineitem",
        # the byte-exact frame digest form
        "good_frames": "SELECT md5(substring(h, ob * 2 + 1, 32)) FROM "
                       "(SELECT hex(encode(text)) AS h, 0 AS ob "
                       "FROM documents)",
    }
    planted = {
        "bad_sum": "SELECT CAST(SUM(l_extendedprice * (1 - l_discount))"
                   " AS DOUBLE) AS rev FROM lineitem GROUP BY l_suppkey",
        "bad_avg": "SELECT CAST(AVG(o_totalprice) AS DOUBLE) FROM orders",
        "bad_frame": "SELECT md5(substring(text, 1, 16)) FROM documents",
        "bad_frame_enc": "SELECT md5(encode(substring(text, off, 16))) "
                         "FROM documents",
    }
    ok = True
    v = lint(clean)
    if v:
        print(f"SELF-TEST FAIL: clean SQL flagged: {v}")
        ok = False
    for key, sql in planted.items():
        if not lint({key: sql}):
            print(f"SELF-TEST FAIL: planted violation NOT caught: {key}")
            ok = False
    print("self-test: " + ("PASS (4 clean pass, 4 planted caught)"
                           if ok else "FAIL"))
    return 0 if ok else 1


def main(argv):
    if argv and argv[0] == "--self-test":
        return self_test()
    if len(argv) != 1:
        print(__doc__)
        return 2
    oracle = json.load(open(argv[0]))
    violations = lint(oracle)
    for key, rule, msg in violations:
        print(f"VIOLATION {key} [{rule}]: {msg}")
    print(f"lint_oracle: {len(oracle)} keys, "
          f"{len(violations)} violations")
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
