#!/usr/bin/env python
"""Seeded synthetic-data generator matching the TESTDATA.md schemas and
distributions, for scale factors the driver does not ship (the sandbox has
sf0.001/0.01/0.1; the 100 TB design claims need at least one decade of
measured scaling — VERDICT r3 ask #2).

Row counts follow the observed driver scaling (rows ∝ sf, with the fixed
dims and the clamped doc/embedding tables):

  customer 150k·sf   supplier 10k·sf   part 200k·sf   orders 1.5M·sf
  lineitem 6M·sf     events 1M·sf      documents max(500, 50k·sf)
  embeddings max(500, 20k·sf)          region 5, nation 25 (fixed)

Value distributions are matched to the driver tables (measured at sf0.1):
uniform TPC-H-ish dimensions, 30-day event stream over 15k·sf users,
5-language documents of 10-100 words over a 31-word vocabulary,
N(0, 0.13²) 64-d embeddings with 10 labels.

The scaling artifact is generated with THIS generator at two scale
factors (0.1 and 1) so the BENCH ratio is generator-independent; the
driver's own sf0.1 numbers are reported alongside in SCALING.md.

The ``vocab`` argument picks the documents corpus shape:

- ``driver`` (default): the 31-word vocabulary and 10-100-word uniform
  lengths measured from the shipped driver tables — generator-parity with
  /root/testdata for apples-to-apples query results.
- ``zipf``: a realistic corpus — 50k-word Zipf-Mandelbrot vocabulary
  (s=1.07, q=2.7, the published English fit) and log-normal doc lengths
  (median ~80 words, clamped 10-1000).  This is the fixture that separates
  plan defects from vocabulary artifacts in the n-gram dedup family: on 31
  words, shingle-bucket collision density grows quadratically with corpus
  size; on a Zipf vocabulary the prefix-filter candidate density per doc
  stays roughly constant (VERDICT r4 ask #1).

Usage: python scripts/gen_sf.py SF OUTDIR [seed] [driver|zipf]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000
EPOCH_1995 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
EPOCH_2024 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
ADJS = ["large", "hot", "small", "cold", "dim", "new", "old", "bright"]
NOUNS = ["ring", "bolt", "gear", "case", "plate", "wire", "lens", "frame"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
VOCAB = ("spark line column order small sort fast value scan hash slow group "
         "batch part query agg table stream key window join vector filter "
         "customer the a g text doc index").split()
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def _ts(col_us: np.ndarray) -> pa.Array:
    return pa.array(col_us, type=pa.timestamp("us"))


_SYLLABLES = ("ba be bi bo bu ca ce ci co cu da de di do du fa fe fi fo fu "
              "ga ge gi go gu ka ke ki ko ku la le li lo lu ma me mi mo mu "
              "na ne ni no nu pa pe pi po pu ra re ri ro ru sa se si so su "
              "ta te ti to tu va ve vi vo vu za ze zi zo zu").split()


def zipf_vocab(n_words: int, rng: np.random.RandomState):
    """(words, probabilities): ``n_words`` pronounceable pseudo-words with
    Zipf-Mandelbrot rank frequencies p(r) ∝ 1/(r+q)^s, s=1.07, q=2.7 —
    the classic fit for English text."""
    syl = np.array(_SYLLABLES)
    words, seen = [], set()
    # 2-4 syllables: 75^2=5.6k, 75^3=422k combos — plenty for 50k distinct
    n_syl = rng.randint(2, 5, size=int(n_words * 1.3))
    picks = rng.randint(0, len(syl), size=(len(n_syl), 4))
    for k, row in zip(n_syl, picks):
        w = "".join(syl[row[:k]])
        if w not in seen:
            seen.add(w)
            words.append(w)
        if len(words) == n_words:
            break
    while len(words) < n_words:  # pathological-collision backstop
        w = "".join(syl[rng.randint(0, len(syl), 3)]) + str(len(words))
        if w not in seen:
            seen.add(w)
            words.append(w)
    ranks = np.arange(1, n_words + 1, dtype=np.float64)
    p = 1.0 / np.power(ranks + 2.7, 1.07)
    return np.array(words), p / p.sum()


def write(outdir: str, name: str, table: pa.Table, shards: int = 1) -> None:
    """Write one table; large tables shard into a ``<name>.parquet/``
    directory of part files.  A single tiny file is an artifact no real
    dataset at scale has — it caps Spark's scan parallelism at 1-2 tasks,
    which starves compute-heavy scans (a 20k×64-d kNN corpus is KBs of
    bytes but seconds of FLOPs).  Sharding restores the file-granular
    parallelism a production table layout provides for free."""
    path = os.path.join(outdir, f"{name}.parquet")
    if shards <= 1:
        pq.write_table(table, path)
    else:
        os.makedirs(path, exist_ok=True)
        n = table.num_rows
        for s in range(shards):
            lo, hi = s * n // shards, (s + 1) * n // shards
            pq.write_table(table.slice(lo, hi - lo),
                           os.path.join(path, f"part-{s:05d}.parquet"))
    print(f"  {name}: {table.num_rows:,} rows ({max(shards, 1)} file(s))",
          file=sys.stderr)


def generate(sf: float, outdir: str, seed: int = 42,
             vocab: str = "driver") -> None:
    if vocab not in ("driver", "zipf"):
        raise ValueError(f"vocab must be driver|zipf, got {vocab!r}")
    rng = np.random.RandomState(seed)
    os.makedirs(outdir, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))
    n_users = int(15_000 * sf)

    write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    write(outdir, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.randint(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.randint(0, 5, n_cust)],
    }))
    write(outdir, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.randint(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    }))
    keys = np.arange(n_part, dtype=np.int64)
    write(outdir, "part", pa.table({
        "p_partkey": keys,
        "p_name": [f"{ADJS[i % 8]} {NOUNS[(i // 8) % 8]}" for i in range(n_part)],
        "p_brand": np.array([f"Brand#{b}" for b in range(1, 26)])[rng.randint(0, 25, n_part)],
        "p_type": np.array(PTYPES)[rng.randint(0, 6, n_part)],
        "p_size": pa.array(rng.randint(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + (keys % 1000) / 10.0, 1),
    }))

    span = EPOCH_1995 + np.int64(6.6 * 365 * DAY_US)
    odate = (EPOCH_1995
             + (rng.randint(0, int(6.6 * 365), n_ord).astype(np.int64) * DAY_US))
    write(outdir, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.randint(0, max(n_cust, 1), n_ord).astype(np.int64),
        "o_orderstatus": np.array(["O", "F", "P"])[rng.randint(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _ts(odate),
        "o_orderpriority": np.array(PRIORITIES)[rng.randint(0, 5, n_ord)],
    }), shards=1 if n_ord < 500_000 else 8)
    lok = rng.randint(0, max(n_ord, 1), n_li).astype(np.int64)
    sdate = odate[lok] + rng.randint(1, 95, n_li).astype(np.int64) * DAY_US
    write(outdir, "lineitem", pa.table({
        "l_orderkey": lok,
        "l_partkey": rng.randint(0, max(n_part, 1), n_li).astype(np.int64),
        "l_suppkey": rng.randint(0, max(n_supp, 1), n_li).astype(np.int64),
        "l_linenumber": pa.array(rng.randint(1, 8, n_li), pa.int32()),
        "l_quantity": rng.randint(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.randint(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.randint(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["R", "A", "N"])[rng.randint(0, 3, n_li)],
        "l_linestatus": np.array(["O", "F"])[rng.randint(0, 2, n_li)],
        "l_shipdate": _ts(np.minimum(sdate, span + 94 * DAY_US)),
    }), shards=1 if n_li < 2_000_000 else 32)

    gaps = rng.exponential(30 * DAY_US / max(n_ev, 1), n_ev)
    ets = EPOCH_2024 + np.cumsum(gaps).astype(np.int64)
    write(outdir, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": _ts(ets),
        "user_id": rng.randint(0, max(n_users, 1), n_ev).astype(np.int64),
        "event_type": np.array(EVENT_TYPES)[rng.randint(0, 5, n_ev)],
        "value": np.round(np.abs(rng.randn(n_ev)) * 127, 2),
        "props": [f'{{"k": {k}}}' for k in rng.randint(0, 100, n_ev)],
    }), shards=1 if n_ev < 500_000 else 8)

    if vocab == "zipf":
        vwords, vp = zipf_vocab(50_000, rng)
        # log-normal lengths: median ~80 words, natural long tail
        lens = np.clip(np.exp(rng.normal(np.log(80), 0.8, n_doc)),
                       10, 1000).astype(np.int64)
        words = vwords[rng.choice(len(vwords), int(lens.sum()), p=vp)]
        def _rand_word():
            return vwords[rng.choice(len(vwords), p=vp)]
    else:
        vwords = np.array(VOCAB)
        lens = rng.randint(10, 101, n_doc)
        words = vwords[rng.randint(0, len(vwords), int(lens.sum()))]
        def _rand_word():
            return VOCAB[rng.randint(0, len(VOCAB))]
    texts, pos = [], 0
    for ln in lens:
        texts.append(" ".join(words[pos:pos + ln]))
        pos += ln
    # Plant duplicates at driver-like rates (the shipped sf0.1 documents
    # contain exact-dup rows and near-dup pairs — without them the dedup
    # family verifies candidates but never emits, which is not the
    # workload).  2% exact copies; 3% near copies with ~2% of tokens
    # swapped (shingle jaccard ≈ 0.9, above both the 0.5 and 0.8
    # thresholds the declared queries use).
    n_exact_dup = n_doc // 50
    n_near_dup = 3 * n_doc // 100
    victims = rng.choice(n_doc, n_exact_dup + n_near_dup, replace=False)
    sources_ = rng.randint(0, n_doc, n_exact_dup + n_near_dup)
    for v, s in zip(victims[:n_exact_dup], sources_[:n_exact_dup]):
        texts[v] = texts[s]
    for v, s in zip(victims[n_exact_dup:], sources_[n_exact_dup:]):
        tk = texts[s].split()
        swap = rng.rand(len(tk)) < 0.02
        for i in np.flatnonzero(swap):
            tk[i] = _rand_word()
        texts[v] = " ".join(tk)
    write(outdir, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)],
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }), shards=1 if n_doc < 16_000 else 32)

    emb = (rng.randn(n_emb, 64) * 0.13).astype(np.float32)
    write(outdir, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.randint(0, 10, n_emb), pa.int32()),
    }), shards=1 if n_emb < 16_000 else 32)

    meta = {"sf": sf, "seed": seed, "vocab": vocab,
            "generator": "scripts/gen_sf.py"}
    with open(os.path.join(outdir, "GENERATED.json"), "w") as f:
        json.dump(meta, f)


if __name__ == "__main__":
    sf = float(sys.argv[1])
    outdir = sys.argv[2]
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    vocab = sys.argv[4] if len(sys.argv) > 4 else "driver"
    generate(sf, outdir, seed, vocab)
