"""Driver-mimicking self-check: run every __spark_entry__.queries() entry on
Spark AND its oracle_sql() on DuckDB at sf0.01; compare row count, column
names, and an order-insensitive value hash. Run before every commit that
touches the gate (python tools/check_oracle.py [sf_dir])."""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def value_hash(rows, columns) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: check_oracle.py [sf_dir] [names...] [--json OUT]")
            return 2
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = argv[1:] or None

    import __spark_entry__ as entry
    from mimirsbrunn_spark.session import get_spark

    spark = get_spark(app_name="check_oracle", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = 0
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e).splitlines()[0][:200]}")
            report[name] = {"ok": False, "err": f"spark: {type(e).__name__}"}
            failures += 1
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(srows)} (no oracle — rows-only check)")
            report[name] = {"ok": True, "weak": True, "rows": len(srows)}
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = [tuple(r) for r in res.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e).splitlines()[0][:200]}")
            report[name] = {"ok": False, "err": f"duckdb: {type(e).__name__}"}
            failures += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema {sorted(scols)} != {sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if not problems:
            sh, oh = value_hash(srows, scols), value_hash(orows, ocols)
            if sh != oh:
                problems.append(f"value hash {sh} != {oh}")
                # show a few differing lines to debug
                sset = {"\x1f".join(canon(v) for v in r) for r in srows}
                oset = {"\x1f".join(canon(v) for v in r) for r in orows}
                for d in list(sset - oset)[:3]:
                    print(f"        spark-only: {d[:160]}")
                for d in list(oset - sset)[:3]:
                    print(f"        duck-only : {d[:160]}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            report[name] = {"ok": False, "err": "; ".join(problems)[:300]}
            failures += 1
        else:
            print(f"ok    {name}: rows={len(srows)}")
            report[name] = {"ok": True, "rows": len(srows)}
    print(f"\n{len(qs)} queries, {failures} failures")
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(report),
                    "failures": failures,
                    "results": report,
                },
                fh,
                indent=1,
            )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
