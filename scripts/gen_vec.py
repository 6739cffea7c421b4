#!/usr/bin/env python
"""Generate a standalone embeddings-only corpus for ANN scale experiments
(the `testdata_gen/vec200k` table SCALING.md's second-decade HNSW section
measures).  Same distribution as scripts/gen_sf.py's embeddings stage
(N(0, 0.13²) float32, 64-d, 10 labels, seed 42), sharded so scans
parallelize.

Usage: python scripts/gen_vec.py N_ROWS OUT_DIR
  e.g. python scripts/gen_vec.py 200000 testdata_gen/vec200k
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "testdata_gen/vec200k"
    out = os.path.join(out_dir, "embeddings.parquet")
    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(42)
    shards = min(32, max(1, n // 6250))
    per = n // shards
    for s in range(shards):
        lo = s * per
        hi = n if s == shards - 1 else lo + per
        emb = (rng.randn(hi - lo, 64) * 0.13).astype(np.float32)
        pq.write_table(pa.table({
            "vec_id": np.arange(lo, hi, dtype=np.int64),
            "embedding": pa.array(list(emb), pa.list_(pa.float32())),
            "label": pa.array(rng.randint(0, 10, hi - lo), pa.int32()),
        }), f"{out}/part-{s:05d}.parquet")
    open(f"{out}/_SUCCESS", "w").close()
    print(f"wrote {n} rows in {shards} shards to {out}")


if __name__ == "__main__":
    main()
