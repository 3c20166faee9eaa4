#!/usr/bin/env python3
"""Generate a ~10x scale-up of the sf0.1 fixture into a new directory, for
superlinearity checks (driver-side tooling; the engine never reads this in
normal runs).

Facts (lineitem, orders, events, documents, embeddings) are replicated K
times with shifted keys so key cardinality scales with volume (sessions,
dedup groups, join keys all grow ~K-fold rather than densifying); document
texts get a per-replica suffix token so replicas are NEAR-duplicates (the
realistic shape for minhash/LSH) instead of exact copies. Dimensions are
copied as-is.

Usage: python3 tools/gen_scale.py /root/testdata/sf0.1 /tmp/sf1x 10
"""
import sys

import duckdb

src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
con = duckdb.connect()
con.execute(f"SET threads TO 16")

import os
os.makedirs(dst, exist_ok=True)

def copy(table):
    con.execute(f"""COPY (SELECT * FROM read_parquet('{src}/{table}.parquet'))
                    TO '{dst}/{table}.parquet' (FORMAT PARQUET)""")

def scale(table, sql):
    reps = " UNION ALL ".join(sql.format(i=i) for i in range(k))
    con.execute(f"""COPY ({reps}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)""")

for t in ["region", "nation", "customer", "supplier", "part"]:
    copy(t)

con.execute(f"CREATE VIEW li AS SELECT * FROM read_parquet('{src}/lineitem.parquet')")
con.execute(f"CREATE VIEW od AS SELECT * FROM read_parquet('{src}/orders.parquet')")
con.execute(f"CREATE VIEW ev AS SELECT * FROM read_parquet('{src}/events.parquet')")
con.execute(f"CREATE VIEW dc AS SELECT * FROM read_parquet('{src}/documents.parquet')")
con.execute(f"CREATE VIEW em AS SELECT * FROM read_parquet('{src}/embeddings.parquet')")
okey = con.execute("SELECT max(o_orderkey)+1 FROM od").fetchone()[0]
ekey = con.execute("SELECT max(event_id)+1, max(user_id)+1 FROM ev").fetchone()
dkey = con.execute("SELECT max(doc_id)+1 FROM dc").fetchone()[0]
vkey = con.execute("SELECT max(vec_id)+1 FROM em").fetchone()[0]

scale("lineitem",
      f"SELECT * REPLACE (l_orderkey + {{i}}*{okey} AS l_orderkey) FROM li")
scale("orders",
      f"SELECT * REPLACE (o_orderkey + {{i}}*{okey} AS o_orderkey) FROM od")
# events goes through pyarrow: DuckDB's parquet writer downgrades
# TIMESTAMP_NS to us, but the engine reads events.ts as nanos-as-long
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
evt = pq.read_table(f"{src}/events.parquet")
parts = []
for i in range(k):
    t2 = evt.set_column(evt.schema.get_field_index("event_id"), "event_id",
                        pc.add(evt["event_id"], i * ekey[0]))
    t2 = t2.set_column(t2.schema.get_field_index("user_id"), "user_id",
                       pc.add(t2["user_id"], i * ekey[1]))
    parts.append(t2)
pq.write_table(pa.concat_tables(parts), f"{dst}/events.parquet")
scale("documents",
      f"SELECT * REPLACE (doc_id + {{i}}*{dkey} AS doc_id, "
      f"text || ' replica{{i}}' AS text) FROM dc")
scale("embeddings",
      f"SELECT * REPLACE (vec_id + {{i}}*{vkey} AS vec_id) FROM em")

for t in ["lineitem", "orders", "events", "documents", "embeddings"]:
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n}")
