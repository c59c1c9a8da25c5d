#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers every fixture parquet in
DuckDB as a view named after the table, runs each oracle, and compares to
the Spark result parquet at <verifyOutDir>/<name>/ — column names sorted,
rows sorted, values compared with exact equality (doubles must be
bit-identical, which the engine guarantees via decimal-exact arithmetic).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


class NonScalarCell(Exception):
    """The driver's pandas comparator dies sorting rows that contain
    list/dict/ndarray cells (r16: cur16/tx33, ``TypeError: unhashable
    type: 'numpy.ndarray'``).  str(v) canonicalization here would accept
    output shapes the driver rejects, so FAIL them locally too: gate
    outputs must be scalar atomic columns."""


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, (list, tuple, dict, set)) or type(v).__module__ == "numpy":
                raise NonScalarCell(
                    f"non-scalar cell in column '{cols[i]}' "
                    f"({type(v).__name__}): the driver comparator cannot "
                    f"sort this — render arrays as md5(array_join(..)) or "
                    f"a joined string")
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            rr.append(str(v))
        out.append(tuple(rr))
    out.sort()
    return [c for c in sorted(cols)], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_path = Path(out_dir) / name
        if not spark_path.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            o = con.execute(sql)
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
            s = con.execute(f"SELECT * FROM '{spark_path}/*.parquet'")
            scols = [d[0] for d in s.description]
            srows = s.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        try:
            oc, orr = canon(orows, ocols)
            sc, srr = canon(srows, scols)
        except NonScalarCell as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if oc != sc:
            print(f"FAIL {name}: columns differ oracle={oc} spark={sc}")
            n_fail += 1
        elif orr != srr:
            diff = [(a, b) for a, b in zip(orr, srr) if a != b][:3]
            print(f"FAIL {name}: rows differ (oracle {len(orr)} vs spark {len(srr)}); first diffs: {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
