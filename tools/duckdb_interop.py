#!/usr/bin/env python3
"""DuckDB external-reader interop check over a TxLog lake table.

The reference demos DuckDB reading the broker's lake output
(duckdb-init.sql). This replays that oracle against the native parquet
lake: read the Hive-partitioned table directory DuckDB-side (the
`_graft_log` manifest dir is underscore-hidden and excluded by the
glob) and compare the aggregate to what the Spark-side TxLog reader
computed (LakeInteropProbe writes expected.json).
"""
import json
import sys

import duckdb


def main():
    expected = json.load(open("/tmp/graft-lake-interop/expected.json"))
    con = duckdb.connect()
    got = con.execute("""
        SELECT lang, count(*) AS n,
          CAST(sum(length(text)) AS BIGINT) AS len,
          min(doc_id) AS lo, max(doc_id) AS hi
        FROM read_parquet('/tmp/graft-lake-interop/docs/lang=*/*.parquet',
                          hive_partitioning = 1)
        GROUP BY 1 ORDER BY 1""").fetchall()
    got_rows = [
        {"lang": r[0], "n": r[1], "len": r[2], "lo": r[3], "hi": r[4]}
        for r in got
    ]
    if got_rows == expected:
        print(f"INTEROP OK: DuckDB and TxLog agree on {len(got_rows)} partitions")
        sys.exit(0)
    print("INTEROP MISMATCH")
    print("expected:", expected)
    print("got:     ", got_rows)
    sys.exit(1)


if __name__ == "__main__":
    main()
