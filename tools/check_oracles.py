"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at the same sf, compare row count,
column names, and an order-insensitive value hash (columns sorted by name,
rows sorted by their serialized form). Usage:

    python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(val):
    import datetime
    import math
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        # kill -0.0 and representation noise
        return repr(round(val, 9))
    if isinstance(val, datetime.datetime):
        return val.replace(tzinfo=None).isoformat()
    if isinstance(val, (list, tuple)):
        return "[" + ",".join(normalize(v) for v in val) + "]"
    if isinstance(val, (bytes, bytearray)):
        return bytes(val).hex()
    if isinstance(val, bool):
        return "true" if val else "false"
    if isinstance(val, int):
        return str(val)
    return str(val)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(normalize(row[i]) for i in order) for row in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from x227f_spark.session import get_spark

    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    # Driver-cap invariant (round-3 regression guard): the driver runs only
    # the FIRST 50 queries() entries, so every oracle-backed name must sit
    # inside that window — enforce the stronger "all oracle-backed entries
    # precede all rows-only entries" so adding queries can't silently push
    # an oracle past the cap.
    DRIVER_QUERY_CAP = 50
    names = list(qs)
    missing = sorted(set(oracles) - set(names))
    assert not missing, f"oracle_sql() names absent from queries(): {missing}"
    first_rows_only = next(
        (i for i, n in enumerate(names) if n not in oracles), len(names))
    late_oracles = [n for n in names[first_rows_only:] if n in oracles]
    assert not late_oracles, (
        f"oracle-backed entries listed after a rows-only entry: {late_oracles}")
    past_cap = [n for n in names[DRIVER_QUERY_CAP:] if n in oracles]
    assert not past_cap, (
        f"oracle-backed entries past the driver's {DRIVER_QUERY_CAP}-query "
        f"cap: {past_cap}")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={len(s_rows)} (no oracle, rows-only)")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        dt = time.monotonic() - t0
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount {len(s_rows)} != {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns {sorted(s_cols)} != {sorted(d_cols)}")
        else:
            sh, dh = value_hash(s_cols, s_rows), value_hash(d_cols, d_rows)
            if sh != dh:
                problems.append(f"value hash {sh} != {dh}")
                # show a few differing rows for debugging
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                set_s = {tuple(normalize(r[i]) for i in order_s) for r in s_rows}
                set_d = {tuple(normalize(r[i]) for i in order_d) for r in d_rows}
                only_s = list(set_s - set_d)[:3]
                only_d = list(set_d - set_s)[:3]
                if only_s:
                    problems.append(f"spark-only: {only_s}")
                if only_d:
                    problems.append(f"duck-only: {only_d}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(str(p) for p in problems))
        else:
            print(f"PASS {name}: rows={len(s_rows)} ({dt:.1f}s)")

    # drop the dedup/dictionary scoped caches and verify nothing leaked —
    # a long-lived session must end the suite with zero cached RDDs
    from x227f_spark.operators.qcache import release_caches
    release_caches()
    leftover = dict(spark.sparkContext._jsc.getPersistentRDDs())
    if leftover:
        print(f"WARN: {len(leftover)} cached RDDs left after release")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
