"""LLM-data-pipeline operator benchmarks at 1M docs (round-5 VERDICT
item 2): wall-time + candidate-pair counts vs the all-pairs count (the
pruning-factor evidence) + planted-duplicate recall + ANN recall@5.

Corpus: deterministic md5-derived mostly-unique texts (16 unique-ish
tokens + 2 hot common tokens per doc) + a mutated 10% copy (drop last
word, doc_id + 2^62) — the only near-duplicates are the planted ones, no
external data. Embeddings: 1M planted-cluster vectors
(ann.planted_embeddings, counter-hashed, partitioning-invariant).

Writes one JSON file (arg 1, default BENCH_llm.json) and prints it.

Usage:  python3 scripts/bench_llm.py [out.json] [n_docs] [n_vecs]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from planet_search_spark.ann import (ivf_assign_scaled,  # noqa: E402
                                     kmeans_train, planted_embeddings)
from planet_search_spark.session import get_spark  # noqa: E402
from planet_search_spark.textops import (  # noqa: E402
    SCALED_BANDS, SCALED_PERMS, _shingles_df, _spark_simhash64,
    connected_components, minhash_candidate_pairs_scaled,
    minhash_verified_pairs_scaled, simhash64_banded_pairs)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_llm.json"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tmp_root = os.environ.get(
        "SPARK_GRAFT_TMP",
        "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir())
    work = tempfile.mkdtemp(prefix="psearch_llm_", dir=tmp_root)
    spark = get_spark(app="bench_llm", cores=cpus,
                      shuffle_partitions=max(cpus, 32))
    R: dict = {"n_docs": n_docs, "n_vecs": n_vecs, "cpus": cpus}
    try:
        # ---- corpus: 1M mostly-unique docs + 10% mutated copies ----------
        # Texts are md5-derived (16 unique-ish 4-hex tokens + 2 hot common
        # tokens, ~16 shingles/doc): the ONLY near-duplicates are the
        # planted mutated copies, so verified-pair counts measure the
        # operator, not corpus replication. (The index-build bench corpus
        # replicates base turns ~200x at 1M — those replicas are GENUINE
        # near-dups of each other and would legitimately explode the
        # verify stage; wrong shape for a dedup benchmark.)
        ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
        k1 = F.md5(F.col("doc_id").cast("string"))
        k2 = F.md5(F.concat(F.lit("x"), k1))
        toks = [F.concat(F.lit("a"), F.substring(k, i + 1, 4))
                for k in (k1, k2) for i in range(0, 32, 4)]
        base = ids.select(
            "doc_id",
            F.concat_ws(" ", F.lit("the"), F.lit("data"), *toks)
             .alias("text"))
        mut = (base.where(F.col("doc_id") % 10 == 3)
               .select((F.col("doc_id") + (1 << 62)).alias("doc_id"),
                       F.regexp_replace("text", r" [^ ]+$", "").alias("text")))
        corpus = base.unionByName(mut)
        corpus.write.mode("overwrite").parquet(f"{work}/corpus.parquet")
        corpus = spark.read.parquet(f"{work}/corpus.parquet")
        n_corpus = corpus.count()
        all_pairs = n_corpus * (n_corpus - 1) / 2
        n_planted = mut.count()
        R["n_corpus"] = n_corpus
        R["n_planted_dups"] = n_planted
        R["all_pairs"] = all_pairs

        # ---- exact dedup --------------------------------------------------
        t0 = time.time()
        n_groups = (corpus.groupBy(F.md5("text").alias("h"))
                    .agg(F.count("*").alias("c"))
                    .where(F.col("c") > 1).count())
        R["dedup_exact"] = {"sec": round(time.time() - t0, 1),
                            "dup_groups": n_groups}

        # ---- scaled MinHash-LSH (128 perms, 16x8) ------------------------
        t0 = time.time()
        n_cand = minhash_candidate_pairs_scaled(corpus).count()
        t_cand = time.time() - t0
        t0 = time.time()
        ver = minhash_verified_pairs_scaled(corpus).cache()
        n_ver = ver.count()
        t_ver = time.time() - t0
        # planted recall: mutated copy pairs found (doc, doc + 2^62)
        found_planted = ver.where(
            F.col("doc_b") - F.col("doc_a") == (1 << 62)).count()
        R["minhash_lsh_scaled"] = {
            "perms": SCALED_PERMS, "bands": SCALED_BANDS,
            "candidate_sec": round(t_cand, 1),
            "verify_sec": round(t_ver, 1),
            "candidates": n_cand, "verified": n_ver,
            "candidate_ratio": n_cand / all_pairs,
            "planted_recall": found_planted / max(n_planted, 1)}

        # ---- frozen MinHash-LSH (8 perms, 4x2) at 100k for the ratio -----
        # (the permissive S-curve is the reason the scale default exists;
        #  at 1M its verify stage would dominate the suite)
        sub = corpus.where(F.pmod(F.xxhash64("doc_id"), F.lit(10)) == 0) \
                    .cache()
        n_sub = sub.count()
        from planet_search_spark.textops import _minhash_bands
        t0 = time.time()
        b = _minhash_bands(_shingles_df(sub))
        n_cand_frozen = (b.alias("a").join(
            b.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select("a.doc_id", "b.doc_id").distinct().count())
        t_frozen = time.time() - t0
        t0 = time.time()
        n_cand_scaled_sub = minhash_candidate_pairs_scaled(sub).count()
        t_scaled_sub = time.time() - t0
        R["minhash_lsh_frozen_vs_scaled_10pct"] = {
            "n_docs": n_sub,
            "frozen_candidates": n_cand_frozen,
            "frozen_sec": round(t_frozen, 1),
            "scaled_candidates": n_cand_scaled_sub,
            "scaled_sec": round(t_scaled_sub, 1),
            "frozen_ratio": n_cand_frozen / (n_sub * (n_sub - 1) / 2),
            "scaled_ratio": n_cand_scaled_sub / (n_sub * (n_sub - 1) / 2)}
        sub.unpersist()

        # ---- simhash64 near-dup ------------------------------------------
        t0 = time.time()
        from planet_search_spark import analysis as A
        toks = corpus.select("doc_id",
                             A.tokens_col(F.col("text")).alias("toks"))
        pairs64 = simhash64_banded_pairs(_spark_simhash64(toks)).cache()
        n_sim_pairs = pairs64.count()
        t_sim = time.time() - t0
        found_sim = pairs64.where(
            F.col("doc_b") - F.col("doc_a") == (1 << 62)).count()
        R["simhash64_neardup"] = {
            "sec": round(t_sim, 1), "pairs": n_sim_pairs,
            "pair_ratio": n_sim_pairs / all_pairs,
            "planted_recall": found_sim / max(n_planted, 1)}
        pairs64.unpersist()

        # ---- near-dup clustering (connected components) ------------------
        t0 = time.time()
        verts = corpus.select("doc_id")
        edges = ver.select("doc_a", "doc_b")
        cc = connected_components(edges, verts)
        n_clusters = cc.select("cluster_id").distinct().count()
        R["dedup_clusters"] = {
            "sec": round(time.time() - t0, 1),
            "n_vertices": n_corpus, "n_edges": n_ver,
            "n_clusters": n_clusters}
        ver.unpersist()

        # ---- ANN: scaled IVF at n_vecs planted vectors -------------------
        emb = planted_embeddings(spark, n_vecs, dim=32, n_clusters=1000,
                                 noise=0.3)
        emb.write.mode("overwrite").parquet(f"{work}/emb.parquet")
        emb = spark.read.parquet(f"{work}/emb.parquet")
        t0 = time.time()
        # max_iters=15: the round-6 spherical (normalized) init converges
        # slower than the r5 mixed-metric one — 5 iters left movement at
        # 1.45 (recall@5 0.94); letting Lloyd run to tol restores recall
        # while the distributed sufficient-stats update keeps train cheap.
        model = kmeans_train(emb, k=int(n_vecs ** 0.5), sample_size=100_000,
                             max_iters=15, tol=1e-3)
        t_train = time.time() - t0
        t0 = time.time()
        assigned = ivf_assign_scaled(emb, model)
        assigned.write.mode("overwrite").parquet(f"{work}/assign.parquet")
        t_assign = time.time() - t0
        assigned = spark.read.parquet(f"{work}/assign.parquet")
        sizes = assigned.groupBy("cluster").count()
        mx, avg = sizes.agg(F.max("count"), F.avg("count")).first()
        # recall@5 for 20 queries: search only the query's bucket vs exact
        # brute force (numpy over the full matrix — the oracle)
        t0 = time.time()
        qrows = (emb.join(assigned, "vec_id")
                 .where(F.col("vec_id") < 20).collect())
        allr = (emb.join(assigned, "vec_id")).toPandas()
        V = np.stack(allr["embedding"].to_numpy()).astype(np.float64)
        Vn = V / np.linalg.norm(V, axis=1)[:, None]
        ids = allr["vec_id"].to_numpy()
        cl = allr["cluster"].to_numpy()
        hits = tot = 0
        for q in qrows:
            qv = np.asarray(q.embedding, float)
            qv /= np.linalg.norm(qv)
            sims = Vn @ qv
            mask = ids != q.vec_id
            order = np.argsort(-sims[mask])
            brute5 = set(ids[mask][order[:5]].tolist())
            bmask = mask & (cl == q.cluster)
            border = np.argsort(-sims[bmask])
            got5 = set(ids[bmask][border[:5]].tolist())
            hits += len(got5 & brute5)
            tot += 5
        t_recall = time.time() - t0
        R["ann_ivf_scaled"] = {
            "k_centroids": model["k"], "lloyd_iters": model["iters"],
            "movement": round(model["movement"], 5),
            "train_sec": round(t_train, 1),
            "assign_sec": round(t_assign, 1),
            "recall_at_5": hits / tot,
            "recall_eval_sec": round(t_recall, 1),
            "bucket_max": int(mx), "bucket_avg": float(avg),
            "scan_fraction_per_query": float(avg) / n_vecs}
        with open(out_path, "w") as f:
            json.dump(R, f, indent=1)
        print(json.dumps(R, separators=(",", ":")))
    finally:
        import shutil
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
