#!/usr/bin/env python
"""Documents-only corpus generator for curation-family scale decades
beyond what full gen_sf.py runs are worth (a 500k-doc documents table is
~200 MB; the matching sf10 lineitem would be 60M rows nobody needs for a
text-pipeline measurement).

Identical distributions to gen_sf.py's documents block (same vocab modes,
log-normal Zipf lengths, 2% exact + 3% near planted duplicates, 20
sources, 5 languages) — imported from gen_sf, not copied.

Usage: python scripts/gen_docs.py N_DOCS OUTDIR [seed] [driver|zipf]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pyarrow as pa

from gen_sf import LANGS, LANG_P, VOCAB, write, zipf_vocab


def generate_docs(n_doc: int, outdir: str, seed: int = 42,
                  vocab: str = "zipf") -> None:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.RandomState(seed)
    if vocab == "zipf":
        vwords, vp = zipf_vocab(50_000, rng)
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
        pos += int(ln)
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


def generate_docs_chunked(n_doc: int, outdir: str, seed: int = 42,
                          vocab: str = "zipf",
                          chunk: int = 1_500_000) -> None:
    """Chunked variant for corpora past the single-allocation envelope
    (a monolithic 15M-doc build peaks ~90 GB: the word-draw array alone
    is len·~110 · 32 B).  Each chunk draws from its own seeded stream and
    plants the 2% exact / 3% near duplicates WITHIN the chunk — the same
    marginal distributions, duplicate rates and Zipf vocabulary, streamed
    to one part file per chunk so peak memory is one chunk's."""
    import pyarrow.parquet as _pq

    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, "documents.parquet")
    os.makedirs(path, exist_ok=True)
    vrng = np.random.RandomState(seed)
    vwords, vp = zipf_vocab(50_000, vrng)
    n_chunks = (n_doc + chunk - 1) // chunk
    for c in range(n_chunks):
        lo = c * chunk
        hi = min(n_doc, lo + chunk)
        m = hi - lo
        rng = np.random.RandomState(seed + 1000 * (c + 1))
        if vocab == "zipf":
            lens = np.clip(np.exp(rng.normal(np.log(80), 0.8, m)),
                           10, 1000).astype(np.int64)
            words = vwords[rng.choice(len(vwords), int(lens.sum()), p=vp)]

            def _rand_word():
                return vwords[rng.choice(len(vwords), p=vp)]
        else:
            lens = rng.randint(10, 101, m)
            words = np.array(VOCAB)[rng.randint(0, len(VOCAB), int(lens.sum()))]

            def _rand_word():
                return VOCAB[rng.randint(0, len(VOCAB))]
        texts, pos = [], 0
        for ln in lens:
            texts.append(" ".join(words[pos:pos + ln]))
            pos += int(ln)
        del words
        n_exact_dup, n_near_dup = m // 50, 3 * m // 100
        victims = rng.choice(m, n_exact_dup + n_near_dup, replace=False)
        sources_ = rng.randint(0, m, n_exact_dup + n_near_dup)
        for v, s in zip(victims[:n_exact_dup], sources_[:n_exact_dup]):
            texts[v] = texts[s]
        for v, s in zip(victims[n_exact_dup:], sources_[n_exact_dup:]):
            tk = texts[s].split()
            swap = rng.rand(len(tk)) < 0.02
            for i in np.flatnonzero(swap):
                tk[i] = _rand_word()
            texts[v] = " ".join(tk)
        ids = np.arange(lo, hi, dtype=np.int64)
        _pq.write_table(pa.table({
            "doc_id": ids,
            "text": texts,
            "lang": np.array(LANGS)[rng.choice(5, m, p=LANG_P)],
            "source": [f"src{i % 20}" for i in range(lo, hi)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }), f"{path}/part-{c:05d}.parquet")
        print(f"chunk {c + 1}/{n_chunks} written ({hi} docs)", flush=True)
    open(f"{path}/_SUCCESS", "w").close()


if __name__ == "__main__":
    n = int(sys.argv[1])
    outdir = sys.argv[2]
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    vocab = sys.argv[4] if len(sys.argv) > 4 else "zipf"
    if n > 2_000_000:
        generate_docs_chunked(n, outdir, seed, vocab)
    else:
        generate_docs(n, outdir, seed, vocab)
