"""ANN recall/cost curves for `similarity.ann_join` at bench scale.

The r3 verdict's residual: `ann_join`'s recall was only pinned on toy
fixtures — "a decontamination run at 10^9 rows needs a recall/cost curve
(bits × bands × probes) measured at the 100k bench scale, or users will
tune blind". This tool measures exactly that:

- corpus: the SAME 100k×64 clustered-blob embedding corpus bench.py uses
  (recipe copied verbatim from bench.py `ensure_emb_corpus` — 128
  hash-placed blob centers, ±0.3 noise), the geometry a near-dup /
  decontamination workload actually has;
- queries: every 397th corpus vector (252 queries), self-match excluded on
  both sides;
- exact baseline: numpy brute-force cosine top-k per query (rounded to 4
  digits, the operator's own determinism convention) — 252×100k×64 flops,
  driver-side, bench-tool-only;
- per config (bits × bands × probes): ONE ann_join run with k large enough
  to return every admitted candidate; recall@10 is derived from rnk<=10,
  candidate cost from the full result size; wall time is the forced
  end-to-end run.

Prints one JSON line per config and a final markdown table for BENCH.md
("ANN recall/cost").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))
EMB_CORPUS = os.environ.get(
    "SPARK_GRAFT_BENCH_EMB_CORPUS", f"/tmp/texteller_embs_{N_DOCS}"
)
QUERY_STRIDE = 397
K = 10
# keep r = bits/bands >= 8: at 100k rows a band with 2^r buckets admits
# ~n/2^r candidates per band, so r < 8 (e.g. 16 bits / 4 bands) degenerates
# toward scanning the corpus (measured 23k candidates/query) — the grid
# varies sharpness (r), redundancy (bands), and multiprobe depth instead
CONFIGS = [
    (16, 2, 0), (16, 2, 8), (16, 2, 16),
    (24, 2, 0), (24, 2, 8), (24, 2, 16),
    (24, 3, 0), (24, 3, 8), (24, 3, 16),
    (32, 4, 0), (32, 4, 8), (32, 4, 16),
]


def ensure_emb_corpus(spark):
    # identical recipe to bench.py ensure_emb_corpus (keep in sync)
    from pyspark.sql import functions as F

    if os.path.exists(EMB_CORPUS):
        return
    blob = F.col("id") % 128

    def comp(i):
        center = (F.pmod(F.hash(blob, F.lit(i)), F.lit(2001)) - 1000) / 1000.0
        noise = (F.pmod(F.hash(F.col("id"), F.lit(i + 64)), F.lit(601)) - 300) / 1000.0
        return (center + F.when(F.col("id") < 128, 0.0).otherwise(noise)).cast("float")

    arr = F.array(*[comp(i) for i in range(64)])
    spark.range(N_DOCS).select(
        F.col("id").alias("vec_id"), arr.alias("embedding")
    ).repartition(64).write.mode("overwrite").parquet(EMB_CORPUS)


def main():
    from pyspark.sql import functions as F

    from texteller_spark.operators.dedup import release_caches
    from texteller_spark.operators.similarity import ann_join
    from texteller_spark.session import build_session

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    ensure_emb_corpus(spark)
    corpus = spark.read.parquet(EMB_CORPUS)
    queries = corpus.filter(F.col("vec_id") % QUERY_STRIDE == 0)

    # exact baseline (numpy, driver-side — bench tool only)
    rows = corpus.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    nrm = np.linalg.norm(mat, axis=1, keepdims=True)
    unit = mat / nrm
    q_mask = ids % QUERY_STRIDE == 0
    q_ids = ids[q_mask]
    sims = np.round(unit[q_mask] @ unit.T, 4)
    exact = {}
    for qi, qid in enumerate(q_ids):
        order = np.argsort(-sims[qi], kind="stable")
        top = [int(ids[j]) for j in order if ids[j] != qid][:K]
        exact[int(qid)] = set(top)
    print(
        json.dumps({"n_corpus": int(len(ids)), "n_queries": int(len(q_ids))}),
        flush=True,
    )

    results = []
    for bits, bands, probes in CONFIGS:
        t0 = time.monotonic()
        got = ann_join(
            queries, corpus, dim=64, k=1_000_000,
            bits=bits, bands=bands, probes=probes,
        ).collect()
        wall = time.monotonic() - t0
        release_caches()
        byq_top, byq_all = {}, {}
        for r in got:
            if r["neighbor_id"] == r["query_id"]:
                continue
            byq_all.setdefault(r["query_id"], []).append(r["neighbor_id"])
            if r["rnk"] <= K + 1:  # +1 headroom for the excluded self-match
                byq_top.setdefault(r["query_id"], []).append(r["neighbor_id"])
        hits = sum(
            len(set(byq_top.get(q, [])[:K]) & e) for q, e in exact.items()
        )
        recall = hits / (K * len(exact))
        cand = sum(len(v) for v in byq_all.values()) / len(exact)
        row = {
            "bits": bits, "bands": bands, "probes": probes,
            "recall_at_10": round(recall, 3),
            "avg_candidates_per_query": round(cand, 1),
            "wall_sec": round(wall, 2),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    print("\n| bits | bands | probes | recall@10 | avg candidates/query | sec |")
    print("| --- | --- | --- | --- | --- | --- |")
    for r in results:
        print(
            f"| {r['bits']} | {r['bands']} | {r['probes']} | "
            f"{r['recall_at_10']:.3f} | {r['avg_candidates_per_query']} | "
            f"{r['wall_sec']} |"
        )


if __name__ == "__main__":
    main()
