"""Dtype-parity audit mirroring the driver's hash-sensitivity.

The driver canonicalizes both the Spark result and the DuckDB oracle result
through pandas and value-hashes them; pandas dtype differences (e.g. DuckDB
HUGEINT -> float64 vs Spark int64) flip the hash even when values match. This
tool converts BOTH sides to pandas exactly like the driver does and reports
any per-column dtype mismatch, plus columns whose values are list-like
(which crash the driver's canonicalizer).

Usage: python tools/check_dtypes.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    filters = sys.argv[2:]

    import __spark_entry__ as entrymod
    from bigdatainvesttink_spark.session import get_spark

    spark = get_spark("dtype-audit")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_bad = n_ok = n_skip = 0
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        if name not in oracles:
            n_skip += 1
            continue
        try:
            spdf = fn(spark, sf_dir).limit(2000).toPandas()
            dkdf = con.execute(
                f"SELECT * FROM ({oracles[name]}) q LIMIT 2000"
            ).df()
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {name}: {type(exc).__name__}: {exc}")
            n_bad += 1
            continue
        issues = []
        sp_cols = {c.lower(): c for c in spdf.columns}
        dk_cols = {c.lower(): c for c in dkdf.columns}
        if set(sp_cols) != set(dk_cols):
            issues.append(
                f"columns spark={sorted(sp_cols)} duck={sorted(dk_cols)}"
            )
        for lc in sorted(set(sp_cols) & set(dk_cols)):
            s = spdf[sp_cols[lc]]
            d = dkdf[dk_cols[lc]]
            if str(s.dtype) != str(d.dtype):
                issues.append(f"{lc}: spark={s.dtype} duck={d.dtype}")
            for side, col in (("spark", s), ("duck", d)):
                if col.dtype == object and len(col) and any(
                    isinstance(v, (list, tuple, dict))
                    or type(v).__name__ == "ndarray"
                    for v in col.head(20)
                ):
                    issues.append(f"{lc}: {side} cell is list-like (crashes driver)")
        if issues:
            n_bad += 1
            print(f"FAIL {name}")
            for i in issues:
                print(f"     {i}")
        else:
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} mismatched, {n_skip} no-oracle")


if __name__ == "__main__":
    main()
