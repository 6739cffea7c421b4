#!/usr/bin/env python
"""Controlled A/B attribution for cross-round bench drift (VERDICT r9
"what's wrong" #1): BENCH_sf0.1_r9 read knn_euclid_gemm at 1.231 s where
r8b read 0.838 s — +47% on code the round-9 diff does not touch.  The
candidates are (a) machine drift between the r8b and r9 measurement
windows, (b) a session-level change in the round-9 tree, or (c) protocol
incomparability (r8b kept the best WHOLE invocation — biased low).

Protocol: the ROUND-8 TREE (git worktree at the given ref) and the
current tree run the same bench.py anchor subset ALTERNATELY (A/B/A/B …,
N invocations each, fresh JVM per invocation, best-of-3 per query inside
each) on the same machine in the same window — interleaving removes the
time-of-measurement confound the cross-round comparison suffers from.
Verdict rule: if the r8 tree reads ≈ the r9/r10 numbers (not its own r8b
artifact), the machine/protocol drifted and the r8b number was the
biased one; if the r8 tree reproduces 0.84 s while the current tree
reads 1.2 s, the session diff is implicated and needs a bisect.

Anchors: the four drifted queries (knn_euclid_gemm +47%, srp_recall
+16%, mix_shards +31%, ngram_jaccard_dups +19%) + two stable controls
(knn_euclid, bq_recall).

Usage: python scripts/attribute_drift.py [REF] [N_INVOCATIONS] [OUT_JSON]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DEFAULT_ANCHORS = ("knn_euclid_gemm,srp_recall,mix_shards,"
                    "ngram_jaccard_dups,knn_euclid,bq_recall")
# Override per investigation: the anchor set is the round's suspect
# queries + stable controls (SPARK_GRAFT_DRIFT_ANCHORS, comma-separated).
ANCHORS = os.environ.get("SPARK_GRAFT_DRIFT_ANCHORS", _DEFAULT_ANCHORS)


def run_bench(tree: str) -> dict[str, list[float]]:
    env = dict(os.environ, SPARK_GRAFT_BENCH_QUERIES=ANCHORS)
    proc = subprocess.run([sys.executable, os.path.join(tree, "bench.py")],
                          capture_output=True, text=True, cwd=tree, env=env)
    runs = {}
    for line in proc.stderr.splitlines():
        line = line.strip()
        if line.startswith('{"runs":'):
            runs = json.loads(line)["runs"]
    if not runs:
        sys.stderr.write(proc.stderr[-3000:])
        raise RuntimeError(f"no runs line from {tree}")
    return runs


def main() -> None:
    ref = sys.argv[1] if len(sys.argv) > 1 else "f837986"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out_json = sys.argv[3] if len(sys.argv) > 3 else "DRIFT_ATTRIBUTION_r10.json"

    old_tree = f"/tmp/bvb_tree_{ref}"
    if not os.path.exists(old_tree):
        subprocess.run(["git", "-C", REPO, "worktree", "add", "--detach",
                        old_tree, ref], check=True)

    per_tree: dict[str, dict[str, list[float]]] = {"old": {}, "new": {}}
    for i in range(n):
        for label, tree in (("old", old_tree), ("new", REPO)):
            runs = run_bench(tree)
            for q, ts in runs.items():
                per_tree[label].setdefault(q, []).append(min(ts))
            sys.stderr.write(f"invocation {i} {label}: "
                             f"{ {q: min(ts) for q, ts in runs.items()} }\n")

    queries = sorted(set(per_tree["old"]) | set(per_tree["new"]))
    table = {}
    for q in queries:
        o = min(per_tree["old"].get(q, [float('inf')]))
        w = min(per_tree["new"].get(q, [float('inf')]))
        table[q] = {"old_min": round(o, 3), "new_min": round(w, 3),
                    "new_over_old": round(w / max(o, 1e-9), 3),
                    "old_inv_mins": [round(x, 3)
                                     for x in per_tree["old"].get(q, [])],
                    "new_inv_mins": [round(x, 3)
                                     for x in per_tree["new"].get(q, [])]}
    rec = {"ref": ref, "invocations_each": n, "anchors": ANCHORS,
           "protocol": ("interleaved A/B, fresh JVM per invocation, "
                        "best-of-3 per query, per-query min across "
                        "invocations"),
           "queries": table}
    if ANCHORS == _DEFAULT_ANCHORS:
        # the round-10 investigation's prior artifacts, kept for the
        # default anchor set only (they describe exactly these queries)
        rec["r8b_artifact"] = {
            "knn_euclid_gemm": 0.838, "srp_recall": 2.944,
            "mix_shards": 0.441, "ngram_jaccard_dups": 2.014,
            "knn_euclid": 1.067, "bq_recall": 2.018}
        rec["r9_artifact"] = {
            "knn_euclid_gemm": 1.231, "srp_recall": 3.423,
            "mix_shards": 0.578, "ngram_jaccard_dups": 2.389,
            "knn_euclid": 1.486, "bq_recall": 2.048}
    print(json.dumps(rec))
    with open(os.path.join(REPO, out_json), "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
