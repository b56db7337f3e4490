"""Generate a 10x sf0.1 replica for the r12 scaling probe (VERDICT r11
item 6). NOT oracle fixture data — a perf-only corpus under /tmp:

- TPC-H tables: 10 copies with all int64 keys offset by copy*10M (dims
  region/nation copied once; int32 FKs into them untouched), so joins
  fan out 10x with the same selectivities.
- documents: 10 copies; copy i>0 suffixes every token with "~i", so
  shingle/token content is DISJOINT across copies — each copy behaves
  like an independent sf0.1 corpus and pair-quadratic dedup work scales
  ~10x (copies are NOT near-duplicates of each other, matching "10x more
  content", not "10x clones").
- embeddings: 10 copies; copy i>0 shifts element 0 by i*1e-3 (byte-
  distinct, distribution preserved); only copy 0 keeps vec_id < N_QUERIES
  so the query set stays fixed while the corpus grows (the production
  shape). Fixed 16 IVF centroids then see 10x occupancy — deliberately
  kept, since measuring that occupancy pressure is the probe's point.
- events: 10 copies, event_id/user_id offset, timestamps unchanged (the
  watermark lifecycle sees 10x rows over the same horizon).

Usage: python tools/gen_sf1_probe.py [/tmp/sf1]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
R = 10
OFF = 10_000_000

INT_OFFSETS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONCE = ["region", "nation"]


def replicate(name: str, out_dir: str) -> None:
    t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
    copies = []
    for i in range(R):
        c = t
        for col in INT_OFFSETS.get(name, []):
            idx = c.schema.get_field_index(col)
            c = c.set_column(
                idx, col, pc.add(c.column(col), pa.scalar(i * OFF, pa.int64()))
            )
        if name == "documents" and i > 0:
            texts = c.column("text").to_pylist()
            sfx = f"~{i}"
            new = [" ".join(w + sfx for w in s.split(" ")) for s in texts]
            c = c.set_column(
                c.schema.get_field_index("text"), "text", pa.array(new, pa.string())
            )
            c = c.set_column(
                c.schema.get_field_index("n_chars"),
                "n_chars",
                pa.array([len(s) for s in new], pa.int64()),
            )
        if name == "embeddings" and i > 0:
            embs = c.column("embedding").to_pylist()
            for e in embs:
                e[0] = e[0] + i * 1e-3
            c = c.set_column(
                c.schema.get_field_index("embedding"),
                "embedding",
                pa.array(embs, c.schema.field("embedding").type),
            )
        copies.append(c)
    out = pa.concat_tables(copies)
    pq.write_table(out, os.path.join(out_dir, f"{name}.parquet"))
    print(f"{name}: {t.num_rows} -> {out.num_rows}", flush=True)


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(out_dir, exist_ok=True)
    for name in COPY_ONCE:
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: copied once ({t.num_rows})", flush=True)
    for name in INT_OFFSETS:
        replicate(name, out_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
