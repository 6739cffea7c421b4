"""BPE vocabulary training (operators/bpe.py)."""

import pytest

from bigvectorbench_spark.operators import bpe


def test_learn_bpe_sennrich_example():
    """The worked example from Sennrich et al. 2016 §3.2: corpus
    {low:5, lower:2, newest:6, widest:3} — the first merges find
    ('e','s') then ('es','t') then ('est','</w>')."""
    hist = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe.learn_bpe(hist, 3)
    assert merges[0] == ("e", "s")        # 9 occurrences
    assert merges[1] == ("es", "t")       # 9
    assert merges[2] == ("est", "</w>")   # 9


def test_learn_bpe_deterministic_tiebreak():
    """Equal-count pairs resolve to the lexicographically smallest —
    the property the cross-engine oracle depends on."""
    # 'ab' and 'cd' both appear twice; ('a','b') < ('c','d')
    hist = [("ab", 2), ("cd", 2)]
    merges = bpe.learn_bpe(hist, 1)
    assert merges == [("a", "b")]
    # input order must not matter
    assert bpe.learn_bpe(list(reversed(hist)), 1) == [("a", "b")]


def test_segment_roundtrip_and_rank_order():
    hist = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe.learn_bpe(hist, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in hist:
        seg = bpe.bpe_segment(w, ranks)
        assert "".join(seg) == w + bpe.MARKER      # lossless
    # a fully-learned word segments to one piece
    assert len(bpe.bpe_segment("newest", ranks)) == 1


def test_segment_matches_apply_in_order():
    """GPT-2-style lowest-rank-first segmentation == Sennrich-style
    apply-merges-in-order (the equivalence the oracle's independent
    implementation exercises corpus-wide)."""
    hist = [("banana", 4), ("bandana", 3), ("cabana", 2), ("anagram", 5),
            ("low", 5), ("lowest", 2)]
    merges = bpe.learn_bpe(hist, 20)
    ranks = {p: i for i, p in enumerate(merges)}

    def apply_in_order(w):
        seq = list(w) + [bpe.MARKER]
        for a, b in merges:
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        return seq

    for w, _ in hist + [("ban", 0), ("anas", 0), ("xyzzy", 0)]:
        assert bpe.bpe_segment(w, ranks) == apply_in_order(w), w


def test_unknown_chars_stay_single():
    merges = bpe.learn_bpe([("aa", 5)], 5)
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe.bpe_segment("zq", ranks) == ["z", "q", bpe.MARKER]


def test_word_histogram_and_min_count(spark):
    df = spark.createDataFrame(
        [(1, "a", "x x x y"), (2, "a", "y z")],
        "doc_id long, source string, text string")
    h = {r["word"]: r["n"]
         for r in bpe.word_histogram(df).collect()}
    assert h == {"x": 3, "y": 2, "z": 1}
    h2 = {r["word"]: r["n"]
          for r in bpe.word_histogram(df, min_count=2).collect()}
    assert h2 == {"x": 3, "y": 2}


def test_bpe_train_report_compression(spark):
    rows = [(i, "s%d" % (i % 2),
             "looking cooked booked looked hooked") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    r0 = {r["source"]: r
          for r in bpe.bpe_train_report(df, num_merges=0).collect()}
    r40 = {r["source"]: r
           for r in bpe.bpe_train_report(df, num_merges=40).collect()}
    for s in ("s0", "s1"):
        assert r0[s]["n_tokens"] == 20  # 4 docs x 5 tokens
        # zero merges: pieces = chars + marker per word
        # looking(7+1) + cooked/booked/looked/hooked (6+1 each)
        assert r0[s]["n_pieces"] == 4 * (8 + 7 + 7 + 7 + 7)
        # with merges the shared 'ooked' structure compresses hard
        assert r40[s]["n_pieces"] < r0[s]["n_pieces"] / 2
        assert r40[s]["pieces_per_token"] < 3.0


def test_vocab_cap_guard(spark):
    df = spark.createDataFrame(
        [(i, "s", "w%d unique%d" % (i, i)) for i in range(30)],
        "doc_id long, source string, text string")
    with pytest.raises(ValueError, match="envelope"):
        bpe.bpe_train_report(df, vocab_cap=10)
