#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify at a
given SF, then execute each oracle SQL in DuckDB over the same parquet
tables and compare.

DRIVER-FAITHFUL (round-11 hardening — the round-10 gate gap):
  * rows are compared in their NATIVE output order (the driver hashes in
    order; a non-total ORDER BY that ties differently across engines is a
    real failure, not noise). A mismatch that disappears after sorting is
    reported as ORDER-NONTOTAL so the root cause is obvious.
  * dtype KINDS must agree before any coercion: a Spark int64 column met
    by a DuckDB float64/decimal (the uncast-HUGEINT sum class that went
    red in CORRECTNESS_r10) FAILS even when the values coerce equal.
  * oracle SQL is linted: any final-output `sum(` not wrapped in a
    CAST(...)/round(...) is rejected up front (DuckDB promotes integer
    sums to HUGEINT -> float64 at the arrow boundary), and the final
    ORDER BY keys are checked to form a total order over the result.
"""
import json, re, subprocess, sys
from decimal import Decimal
from pathlib import Path

import duckdb
import pandas as pd
import pyarrow.parquet as pq

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
RUN_VERIFY = "--no-run" not in sys.argv
ONLY = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]

if RUN_VERIFY:
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {SF_DIR} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=3600,
        env={**__import__("os").environ, "SPARK_GRAFT_CPUS": "8"})
    sys.stdout.write("\n".join(l for l in r.stdout.splitlines()
                               if "[verify]" in l or "error" in l.lower()) + "\n")
    if r.returncode != 0:
        print("VERIFY FAILED"); print(r.stdout[-3000:]); print(r.stderr[-2000:]); sys.exit(1)

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

oracle = json.loads((OUT / "oracle_sql.json").read_text())


# ---------- oracle SQL lints (static, run before any comparison) ----------

def _depth0_spans(sql):
    """Yield (index, char) for chars at paren depth 0 (string-literal aware)."""
    depth, i, in_str = 0, 0, False
    while i < len(sql):
        c = sql[i]
        if in_str:
            if c == "'":
                in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            yield i, c
        i += 1


def _last_kw_at_depth0(sql, kw):
    up = sql.upper()
    last = -1
    flat = list(_depth0_spans(sql))
    pos = {i for i, _ in flat}
    for m in re.finditer(r"\b" + kw + r"\b", up):
        if m.start() in pos:
            last = m.start()
    return last


def final_select_list(sql):
    """Text of the outermost (depth-0) final SELECT's projection list."""
    s = _last_kw_at_depth0(sql, "SELECT")
    if s < 0:
        return ""
    f = _last_kw_at_depth0(sql, "FROM")
    return sql[s + 6: f if f > s else len(sql)]


def uncast_final_sums(sql):
    """Occurrences of sum( in the final select list not nested under a
    cast()/round() wrapper — the HUGEINT promotion hazard."""
    seg = final_select_list(sql)
    bad, stack, i, in_str = [], [], 0, False
    low = seg.lower()
    while i < len(seg):
        c = seg[i]
        if in_str:
            if c == "'":
                in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            m = re.search(r"([a-z_][a-z0-9_]*)\s*$", low[:i])
            fn = m.group(1) if m else ""
            if fn == "sum" and not any(f in ("cast", "round") for f in stack):
                bad.append(i)
            stack.append(fn)
        elif c == ")":
            if stack:
                stack.pop()
        i += 1
    return bad


def final_order_keys(sql):
    """Column names/positions of the final depth-0 ORDER BY (None if absent
    or not statically resolvable)."""
    o = _last_kw_at_depth0(sql, "ORDER")
    if o < 0:
        return None
    tail = sql[o:]
    m = re.match(r"ORDER\s+BY\s+", tail, re.I)
    if not m:
        return None
    body = tail[m.end():]
    # cut at the next depth-0 LIMIT if any
    lim = _last_kw_at_depth0(body, "LIMIT")
    if lim >= 0:
        body = body[:lim]
    keys, cur, depth, in_str = [], "", 0, False
    for c in body:
        if in_str:
            cur += c
            if c == "'":
                in_str = False
        elif c == "'":
            cur += c; in_str = True
        elif c == "(":
            depth += 1; cur += c
        elif c == ")":
            depth -= 1; cur += c
        elif c == "," and depth == 0:
            keys.append(cur.strip()); cur = ""
        else:
            cur += c
    if cur.strip():
        keys.append(cur.strip())
    out = []
    for k in keys:
        k = re.sub(r"\s+(ASC|DESC)\b", "", k, flags=re.I)
        k = re.sub(r"\s+NULLS\s+(FIRST|LAST)\b", "", k, flags=re.I).strip()
        if re.fullmatch(r"\d+", k):
            out.append(int(k))
        elif re.fullmatch(r"[A-Za-z_][A-Za-z0-9_.]*", k):
            out.append(k.split(".")[-1])
        else:
            return None  # expression key — skip totality check
    return out


lint_fail = 0
for name in sorted(oracle):
    if ONLY and name not in ONLY:
        continue
    bad = uncast_final_sums(oracle[name])
    if bad:
        print(f"LINT {name}: final-output sum() without CAST/round at "
              f"select-list offsets {bad} — DuckDB HUGEINT promotion hazard")
        lint_fail += 1

# ---------- dynamic compare ----------

def colsorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.reindex(sorted(df.columns), axis=1)


def is_decimalish(s: pd.Series) -> bool:
    if s.dtype.kind != "O":
        return False
    for v in s.head(50):
        if isinstance(v, Decimal):
            return True
    return False


def values_equal(a: pd.Series, b: pd.Series):
    """(mismatch_desc|None, n_low_float_bits) comparing in native order."""
    if a.dtype.kind == "f" or b.dtype.kind == "f":
        aa = a.astype(float).to_numpy(); bb = b.astype(float).to_numpy()
        bad = ~((aa == bb) | (abs(aa - bb) <= 1e-9 + 1e-9 * abs(bb))
                | (pd.isna(aa) & pd.isna(bb)))
        exact_bad = int((~((aa == bb) | (pd.isna(aa) & pd.isna(bb)))).sum())
        if bad.any():
            i = int(bad.argmax())
            return f"row {i}: {aa[i]} vs {bb[i]}", exact_bad
        return None, exact_bad
    aa = a.astype(str); bb = b.astype(str)
    bad = ~(aa == bb).to_numpy()
    if bad.any():
        i = int(bad.argmax())
        return f"row {i}: {aa.iloc[i]!r} vs {bb.iloc[i]!r}", 0
    return None, 0


def compare(spark_df, duck_df):
    """Returns (None, warns) on pass else (reason, warns). Native row order."""
    warns = []
    for c in spark_df.columns:
        a, b = spark_df[c], duck_df[c]
        ka, kb = a.dtype.kind, b.dtype.kind
        int_kinds = ("i", "u")
        if (ka in int_kinds and (kb == "f" or is_decimalish(b))) or \
           (kb in int_kinds and (ka == "f" or is_decimalish(a))):
            return (f"DTYPE col {c}: spark {a.dtype} vs duck {b.dtype} — "
                    f"driver hash canonicalizes these differently "
                    f"(uncast aggregate?)", warns)
    for c in spark_df.columns:
        mm, exact_bad = values_equal(spark_df[c], duck_df[c])
        if mm:
            return (f"col {c} {mm}", warns)
        if exact_bad:
            warns.append(f"{c}: {exact_bad} rows differ in low float bits")
    return None, warns


ok = fail = 0
for name in sorted(oracle):
    if ONLY and name not in ONLY:
        continue
    pdir = OUT / name
    if not pdir.exists():
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        spark_raw = pq.read_table(str(pdir)).to_pandas()
        duck_raw = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    spark_df, duck_df = colsorted(spark_raw), colsorted(duck_raw)
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"FAIL {name}: cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        fail += 1; continue
    if len(spark_df) != len(duck_df):
        print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
        fail += 1; continue

    # ORDER BY totality: the declared final order keys must determine the
    # row (ties allowed only between fully identical rows).
    keys = final_order_keys(oracle[name])
    total_warn = None
    if keys is not None and len(duck_raw) > 1:
        cols = list(duck_raw.columns)
        try:
            kcols = [cols[k - 1] if isinstance(k, int) else k for k in keys]
            kcols = [k for k in kcols if k in cols]
            if kcols:
                g = duck_raw.astype(str).groupby(kcols, dropna=False).nunique()
                extra = [c for c in g.columns if c not in kcols]
                if extra and (g[extra].max(axis=1) > 1).any():
                    total_warn = (f"ORDER-NONTOTAL: keys {kcols} do not "
                                  f"determine the row — tie order can flake")
        except Exception:
            pass

    reason, warns = compare(spark_df, duck_df)
    for w in warns:
        print(f"  warn {name}.{w}")
    if reason is None:
        if total_warn:
            print(f"FAIL {name}: {total_warn}"); fail += 1
        else:
            print(f"ok   {name} ({len(spark_df)} rows)"); ok += 1
        continue
    # classify: does it pass after a full row sort? then it's pure ordering
    srt = lambda df: df.astype(str).sort_values(by=list(df.columns),
                                                ignore_index=True)
    r2, _ = compare(srt(spark_df), srt(duck_df))
    if reason.startswith("DTYPE") or r2 is not None:
        print(f"FAIL {name}: {reason}"); fail += 1
    else:
        print(f"FAIL {name}: ORDER-NONTOTAL (values match after sort; "
              f"native order differs) first diff {reason}"); fail += 1

# rows-only queries
names_out = {p.name for p in OUT.iterdir() if p.is_dir()}
rows_only = sorted(names_out - set(oracle))
for name in rows_only:
    if ONLY and name not in ONLY:
        continue
    n = pq.read_table(str(OUT / name)).num_rows
    print(f"rows {name}: {n} rows {'ok' if n > 0 else 'EMPTY!'}")

print(f"\n{ok} ok, {fail} fail, {lint_fail} lint, {len(rows_only)} rows-only")
sys.exit(1 if (fail or lint_fail) else 0)
