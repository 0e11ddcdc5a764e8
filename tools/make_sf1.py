"""Deterministic sf1 documents table for the one-off correctness
spot-gate (VERDICT r3 item 8: sf0.1 caught a DIVIDE_BY_ZERO that sf0.01
could not — run the flagship/kernel queries once at 10x that scale).

sf1 documents = 10 deterministic copies of the driver's sf0.1 table with
disjoint doc_id ranges (copy k shifts ids by k * 10_000_000).  Identical
text across copies is fine for the KERNEL queries this gate covers (they
tokenize text per doc; no dedup semantics involved).  ``embeddings`` is
materialized the same way (vec_id shifted per copy) so the
quadratic-stage embedding operators (dedup_semantic, knn_graph,
dedup_embedding_cosine) have a 10x, dup-saturated worst-case corpus to
bench against.  The other eight tables are symlinked from sf0.1 so the
checker's view registration succeeds.

Writes /root/repo/.testdata_sf1/ (gitignored).  Idempotent.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".testdata_sf1")
COPIES = 10
SHIFT = 10_000_000

TABLES = "region nation customer supplier part orders lineitem events".split()

#: (table, id column) pairs materialized as 10 id-shifted copies
REPLICATED = (("documents", "doc_id"), ("embeddings", "vec_id"))


def _replicate(name: str, id_col: str) -> str:
    out = os.path.join(DST, f"{name}.parquet")
    if os.path.islink(out):          # upgrade an old symlinked layout
        os.unlink(out)
    if not os.path.exists(out):
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pq.read_table(f"{SRC}/{name}.parquet")
        id_pos = t.column_names.index(id_col)
        parts = []
        for k in range(COPIES):
            ids = pa.compute.add(t[id_col], k * SHIFT)
            parts.append(t.set_column(id_pos, id_col, ids))
        pq.write_table(pa.concat_tables(parts), out, compression="zstd")
    return out


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    for name, id_col in REPLICATED:
        _replicate(name, id_col)
    out = os.path.join(DST, "documents.parquet")
    for name in TABLES:
        link = os.path.join(DST, f"{name}.parquet")
        if not os.path.exists(link):
            os.symlink(f"{SRC}/{name}.parquet", link)
    import pyarrow.parquet as pq2

    print("sf1 documents rows:",
          pq2.ParquetFile(out).metadata.num_rows)


if __name__ == "__main__":
    main()
