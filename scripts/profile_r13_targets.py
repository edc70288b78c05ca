"""Phase-level profiling for the round-13 optimization targets.

Times the individual eager jobs inside graph_core_peel_quantile,
similarity_standing_index_{topk,recall_sweep,time_travel} at sf0.1 so the
optimization attacks the measured dominant phase, not a guess (guide §1).
Run on a quiet machine AFTER the bench warm-up caches exist.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from akka_streams_kinesis_spark import get_session, registry  # noqa: E402

registry.load_all()

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{dt:8.3f}s  {label}", flush=True)
    return out


def main() -> None:
    import pyspark.sql.functions as F

    spark = get_session("r13-profile")
    spark.sparkContext.setLogLevel("ERROR")
    from akka_streams_kinesis_spark.io import table

    for tb in ("lineitem", "orders", "embeddings"):
        table(spark, SF_DIR, tb).limit(1).count()

    # ---- core peel phases --------------------------------------------
    from pyspark.sql import Window as W

    from akka_streams_kinesis_spark.operators.graph import (
        _PEEL_PCT_DEN,
        _PEEL_PCT_NUM,
        _purchase_edges,
    )
    from akka_streams_kinesis_spark.shared import transient_persist

    def _old_degree_threshold(deg):
        dist = deg.groupBy("d").agg(F.count("*").alias("n"))
        wcum = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
        wall = W.partitionBy()
        return (
            dist.select(
                "d",
                F.sum("n").over(wcum).alias("cum"),
                F.sum("n").over(wall).alias("tot"),
            )
            .filter(
                F.lit(_PEEL_PCT_DEN) * F.col("cum")
                >= F.lit(_PEEL_PCT_NUM) * F.col("tot")
            )
            .agg(F.min("d").alias("k"))
        )

    e = t("peel: shared edge build", lambda: _purchase_edges(spark, SF_DIR))
    for r in (1, 2, 3):
        cdeg = transient_persist(e.groupBy("custkey").agg(F.count("*").alias("d")))
        sdeg = transient_persist(e.groupBy("suppkey").agg(F.count("*").alias("d")))
        kc = t(f"peel r{r}: kc collect", lambda: int(_old_degree_threshold(cdeg).collect()[0]["k"]))
        ks = t(f"peel r{r}: ks collect", lambda: int(_old_degree_threshold(sdeg).collect()[0]["k"]))
        alive_c = cdeg.filter(F.col("d") >= kc).select("custkey")
        alive_s = sdeg.filter(F.col("d") >= ks).select("suppkey")
        e2 = (
            e.join(F.broadcast(alive_c), "custkey", "left_semi")
            .join(F.broadcast(alive_s), "suppkey", "left_semi")
            .select("custkey", "suppkey")
        )
        e = t(f"peel r{r}: localCheckpoint", lambda: e2.localCheckpoint())

    # full query for reference
    t("peel: full query noop", lambda: registry.QUERIES["graph_core_peel_quantile"](spark, SF_DIR).write.format("noop").mode("overwrite").save())

    # ---- standing index topk phases ----------------------------------
    from akka_streams_kinesis_spark.operators.streaming_queries import (
        _SI_NQ,
        _SI_RADIUS,
        _ensure_standing_index,
        _standing_search,
    )
    from akka_streams_kinesis_spark.streaming.ann_index import (
        COARSE_BITS,
        _N_ID_BUCKETS,
        load_snapshot,
        probe_cells,
        read_directory,
        read_idmap,
        read_store,
    )
    from akka_streams_kinesis_spark.operators.similarity import cosine_sim
    from pyspark.sql import Window

    root = t("topk: ensure index (cached)", lambda: _ensure_standing_index(spark, SF_DIR))
    snap = load_snapshot(root)
    q_idbs = sorted({i % _N_ID_BUCKETS for i in range(_SI_NQ)})
    q_cells = t(
        "topk: idmap collect",
        lambda: {
            r["vec_id"]: r["c8"]
            for r in read_idmap(spark, root, q_idbs, snapshot=snap)
            .filter(F.col("vec_id") < _SI_NQ)
            .collect()
        },
    )
    pairs = [
        (qid, cell)
        for qid, c8 in sorted(q_cells.items())
        for cell in probe_cells(c8, _SI_RADIUS)
    ]
    probe_df = spark.createDataFrame(pairs, "query_id long, c8 string")
    probed = sorted({c for _, c in pairs})
    pruned = read_store(spark, root, cells=probed, snapshot=snap).select(
        "vec_id", "c8", "embedding"
    )
    cand = transient_persist(pruned.join(F.broadcast(probe_df), "c8"))
    t("topk: cand materialize (count)", lambda: cand.count())
    d8 = read_directory(spark, root, snapshot=snap).select(
        F.concat(F.lit("b"), F.substring("cell", 1, COARSE_BITS)).alias("c8"),
        "n_vecs",
    )
    n_dir = (
        d8.join(F.broadcast(probe_df), "c8")
        .groupBy("query_id")
        .agg(F.sum("n_vecs").alias("n_cand"))
    )
    n_scan = cand.groupBy("query_id").agg(F.count("*").alias("n_scan"))
    t(
        "topk: dir-consistency count",
        lambda: n_dir.join(n_scan, "query_id", "full")
        .filter(~F.col("n_cand").eqNullSafe(F.col("n_scan")))
        .count(),
    )
    q_emb = cand.filter(
        (F.col("vec_id") == F.col("query_id")) & (F.col("vec_id") < _SI_NQ)
    ).select("query_id", F.col("embedding").alias("q_emb"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    sims = (
        cand.filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(q_emb), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_sim("q_emb", "embedding"), 6).alias("sim"),
        )
    )
    ann = sims.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 10)
    t("topk: ann rerank noop", lambda: ann.write.format("noop").mode("overwrite").save())
    full = read_store(spark, root, snapshot=snap).select("vec_id", "embedding")
    ex_sims = full.join(
        F.broadcast(q_emb), F.col("query_id") != F.col("vec_id")
    ).select(
        "query_id",
        "vec_id",
        F.round(cosine_sim("q_emb", "embedding"), 6).alias("sim"),
    )
    exact = ex_sims.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 10)
    t("topk: exact anchor noop", lambda: exact.write.format("noop").mode("overwrite").save())
    t("topk: full query noop", lambda: registry.QUERIES["similarity_standing_index_topk"](spark, SF_DIR).write.format("noop").mode("overwrite").save())
    t("sweep: full query noop", lambda: registry.QUERIES["similarity_standing_index_recall_sweep"](spark, SF_DIR).write.format("noop").mode("overwrite").save())

    # ---- time travel phases ------------------------------------------
    from akka_streams_kinesis_spark.operators.streaming_queries import (
        _TT_SEARCH_COLS,
        _ensure_tt_index,
        _read_served,
    )

    troot, served = t("tt: ensure index (cached)", lambda: _ensure_tt_index(spark, SF_DIR))
    halves = []
    for v, label in ((1, "pre_update"), (2, "post_update")):
        tsnap = load_snapshot(troot, v)
        h = transient_persist(
            _standing_search(spark, troot, snapshot=tsnap, anchor=False).select(
                F.lit(v).cast("long").alias("version"),
                F.lit(label).alias("state"),
                *_TT_SEARCH_COLS,
            )
        )
        t(f"tt: v{v} search materialize", lambda: h.count())
        halves.append(h)
    live_v1 = halves[0].select(*_TT_SEARCH_COLS)
    recorded = _read_served(spark, served).select(*_TT_SEARCH_COLS)
    t("tt: exceptAll count A", lambda: live_v1.exceptAll(recorded).count())
    t("tt: exceptAll count B", lambda: recorded.exceptAll(live_v1).count())
    t("tt: union noop", lambda: halves[0].unionByName(halves[1]).write.format("noop").mode("overwrite").save())
    t("tt: full query noop", lambda: registry.QUERIES["similarity_standing_index_time_travel"](spark, SF_DIR).write.format("noop").mode("overwrite").save())

    spark.stop()


if __name__ == "__main__":
    main()
