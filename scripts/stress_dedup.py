#!/usr/bin/env python
"""Dedup-at-scale stress: synthesize a corpus with planted near-duplicate
pairs, then time the candidate-bounded dedup operators (MinHash-LSH,
SimHash, prefix-filtered n-gram Jaccard, exact hash) and report recall of
the planted pairs — the evidence that candidate generation stays
O(candidates) instead of O(n²) as the corpus grows.

Usage: python scripts/stress_dedup.py [n_docs] [dup_fraction] [doc_len]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bigvectorbench_spark import get_spark
from bigvectorbench_spark.operators import dedup as dd


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    dup_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    doc_len = int(sys.argv[3]) if len(sys.argv) > 3 else 120
    vocab = 50_000
    n_dup = int(n * dup_frac)

    spark = get_spark("stress-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    parts = spark.sparkContext.defaultParallelism

    # ids < n are base docs (unique word soup over a large vocab, so shingles
    # are rare and candidate joins stay sparse); ids >= n are near-dup copies
    # of (id - n) with ~4% of tokens replaced — above every threshold used.
    def gen(batches):
        import pandas as pd

        def doc_tokens(i: int) -> list[str]:
            rng = np.random.RandomState(int(i) % (2**31))
            return [f"w{t}" for t in rng.randint(0, vocab, doc_len)]

        for pdf in batches:
            ids, texts = [], []
            for i in pdf["id"]:
                i = int(i)
                tk = doc_tokens(i if i < n else i - n)
                if i >= n:  # perturb a deterministic ~4% of positions
                    rng = np.random.RandomState((i * 2654435761) % (2**31))
                    for p in rng.choice(doc_len, max(1, doc_len // 25), replace=False):
                        tk[p] = f"w{rng.randint(0, vocab)}"
                ids.append(i)
                texts.append(" ".join(tk))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    docs = (spark.range(n + n_dup).repartition(parts)
            .withColumnRenamed("id", "id")
            .mapInPandas(gen, schema="doc_id bigint, text string").cache())
    docs.count()
    planted = {(i, i + n) for i in range(n_dup)}
    print(f"corpus: {n}+{n_dup} docs, {doc_len} tokens, vocab {vocab}", flush=True)

    def run(tag, fn):
        t0 = time.perf_counter()
        pairs = {(min(r[0], r[1]), max(r[0], r[1])) for r in fn().collect()}
        dt = time.perf_counter() - t0
        rec = len(pairs & planted) / len(planted) if planted else 1.0
        extra = len(pairs - planted)
        print(f"{tag}: {dt:6.1f}s  recall={rec:.4f}  pairs={len(pairs)} "
              f"(+{extra} unplanted)", flush=True)

    run("minhash-lsh t=0.5 ", lambda: dd.minhash_lsh_pairs(docs, threshold=0.5)
        .select("id_a", "id_b"))
    # simhash hd<=3 targets near-IDENTITY; 4% token perturbation sits at the
    # edge of its design envelope, so partial recall here is the expected
    # contrast with the Jaccard-threshold detectors, not a defect
    run("simhash hd<=3     ", lambda: dd.simhash_pairs(docs, max_hamming=3)
        .select("id_a", "id_b"))
    run("ngram-jaccard t=.5", lambda: dd.ngram_jaccard_pairs(docs, threshold=0.5)
        .select("id_a", "id_b"))
    t0 = time.perf_counter()
    n_groups = (dd.exact_dup_groups(docs)
                .filter("n_docs > 1").count())  # no planted EXACT dups: 0
    print(f"exact-hash        : {time.perf_counter() - t0:6.1f}s  "
          f"multi_doc_groups={n_groups}", flush=True)


if __name__ == "__main__":
    main()
