"""Plan-quality assertions (SURVEY.md §4): Catalyst must push filters to
the parquet scans, prune columns, and broadcast dimension tables. These
pin the *shape* of the physical plan so a regression that silently
de-optimizes a query fails CI, not the 100 TB run."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_iceberg_pyiceberg_local_data_lakehouse_spark.plans.explain import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filter,
    assert_reads_only_columns,
    codegen_stage_count,
    formatted_plan,
)
from apache_iceberg_pyiceberg_local_data_lakehouse_spark.queries import QUERIES


def test_q06_filters_pushed_to_scan(spark, sf_small):
    df = QUERIES["q06_forecast_revenue"](spark, sf_small)
    assert_pushed_filter(df, "l_shipdate")
    # only the 4 referenced columns are read from a 11-column table
    assert_reads_only_columns(
        df, {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}
    )


def test_q01_column_pruning(spark, sf_small):
    df = QUERIES["q01_pricing_summary"](spark, sf_small)
    assert_reads_only_columns(
        df,
        {
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        },
    )


def test_q05_broadcasts_dimensions(spark, sf_small):
    df = QUERIES["q05_region_revenue"](spark, sf_small)
    assert_broadcast_join(df)
    assert_no_cartesian(df)


def test_q03_broadcast_no_cartesian(spark, sf_small):
    df = QUERIES["q03_shipping_priority"](spark, sf_small)
    assert_broadcast_join(df)
    assert_no_cartesian(df)


def test_queries_use_codegen(spark, sf_small):
    """The hot relational paths must run inside WholeStageCodegen.
    AQE hides codegen subtrees until execution, so plan without it for
    the inspection (runtime toggle only - the queries still run under
    AQE everywhere else)."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name in ["q01_pricing_summary", "q13_top_orders_per_customer"]:
            df = QUERIES[name](spark, sf_small)
            assert codegen_stage_count(df) >= 1, f"{name} fell out of codegen"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_anti_join_projects_only_key(spark, sf_small):
    """J1 discipline: the committed-keys side of the dedup anti-join reads
    only the key column."""
    o = spark.read.parquet(f"{sf_small}/orders.parquet")
    keys = o.select("o_orderkey").distinct()
    plan = formatted_plan(keys)
    assert_reads_only_columns(keys, {"o_orderkey"})
    assert "Exchange" in plan  # distinct shuffles once on the key


def test_heavy_queries_avoid_cartesian(spark, sf_small):
    """The near-dup / temporal-join plans must stay hash/broadcast joins -
    a regression to CartesianProduct would be quadratic at scale."""
    for name in [
        "q41_dedup_token_jaccard",
        "q48_minhash_near_duplicates",
        "q35_asof_join",
        "q36_trailing_window_count",
        "q37_session_range_join",
    ]:
        df = QUERIES[name](spark, sf_small)
        assert_no_cartesian(df)


def test_asof_join_single_shuffle(spark, sf_small):
    """The as-of join is one exchange on the key (plus the final agg) -
    not a join at all physically."""
    df = QUERIES["q35_asof_join"](spark, sf_small)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan  # no join operator: union + window
    assert "Window" in plan


def test_r5_operators_avoid_cartesian_and_python(spark, sf_small):
    """The r5 LLM-operator plans: cluster-blocked SemDeDup is an equality
    join on cluster_id (not a nested-loop), contamination broadcasts the
    benchmark gram set, repetition metrics stay JVM-side."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.contamination import (
        ngram_contamination,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.dedup import (
        semantic_duplicates,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.quality_filters import (
        gopher_quality,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.queries import load

    docs = load(spark, sf_small, "documents")
    emb = load(spark, sf_small, "embeddings")
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 4).collect()
    ]
    for df in [
        semantic_duplicates(emb, cents, threshold=0.5),
        ngram_contamination(
            docs.filter(F.col("doc_id") % 2 == 0),
            docs.filter(F.col("doc_id") % 2 == 1),
            n=3,
        ),
        gopher_quality(docs),
    ]:
        assert_no_cartesian(df)
        plan = formatted_plan(df)
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_session3_operators_stay_distributed(spark, sf_small):
    """Session-3 operators: the packing prefix-sum must never collapse
    to a single-partition global window, mixing/LM plans stay JVM-side
    with no cartesian products."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.lm import (
        fit_unigram,
        score_unigram,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.packing import (
        pack_sequences,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.sampling import (
        mix_corpus,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.queries import load

    docs = load(spark, sf_small, "documents")

    packed = pack_sequences(docs, 2048, size_col="n_chars", key_col="doc_id")
    plan = formatted_plan(packed)
    # the scale trap pack_sequences exists to avoid: a no-partition
    # window forces Exchange SinglePartition before the sort
    assert "SinglePartition" not in plan
    assert "Window" in plan  # the per-bucket scan is still a window

    mixed = mix_corpus(
        docs, "source", {"src0": 0.5, "src1": 0.5}, 10_000,
        size_col="n_chars", key_col="doc_id",
    )
    model = fit_unigram(docs)
    scored = score_unigram(docs, model)
    for df in [packed, mixed, scored]:
        assert_no_cartesian(df)
        p = formatted_plan(df)
        assert "BatchEvalPython" not in p
        assert "ArrowEvalPython" not in p
    model.unpersist()


def test_r6_operators_plan_quality(spark, sf_small):
    """Round-6 additions stay JVM-side and distributed: BM25/RRF have
    no Python evaluation and no cartesian; the ranked top-k goes
    through TakeOrderedAndProject (never a full-table single-partition
    window); PQ encode is pure codegen expressions."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.retrieval import (
        bm25_scores,
        rank_by,
        top_terms,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.similarity import (
        pq_encode,
        pq_fit,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.queries import load

    docs = load(spark, sf_small, "documents")
    scored = bm25_scores(docs, top_terms(docs, 3))
    ranked = rank_by(scored, "score_q", k=10)
    p = formatted_plan(ranked)
    assert "TakeOrderedAndProject" in p  # distributed top-k, then rank
    for df in [scored, ranked]:
        assert_no_cartesian(df)
        fp = formatted_plan(df)
        assert "BatchEvalPython" not in fp
        assert "ArrowEvalPython" not in fp

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    books = pq_fit(emb, m=2, nbits=2, n_iters=1, fit_sample=64)
    coded = pq_encode(emb, books)
    fp = formatted_plan(coded)
    assert "BatchEvalPython" not in fp and "ArrowEvalPython" not in fp
    assert "Exchange" not in fp  # encoding is embarrassingly parallel


def test_metadata_agg_reads_no_data(spark, tmp_path):
    """metadata_agg answers from the manifest alone: the returned plan
    is a local relation - no file source, no jobs over data."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.catalog import (
        LakehouseCatalog,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("m")
    df = spark.range(100).select(F.col("id").alias("k"))
    t = cat.create_table("m.t", df.schema)
    t.append(df)
    got = t.metadata_agg({"n": ("count", "*"), "hi": ("max", "k")})
    p = formatted_plan(got)
    assert "FileScan" not in p and "Scan parquet" not in p
    assert got.first()["n"] == 100


def test_r7_operators_plan_quality(spark, sf_small):
    """Plan shapes of the round-7 operators: no cartesian products, the
    PQ ADC scan broadcasts its per-query LUT frame, grouped gap filling
    never collapses to a single partition, canonical dedup is one hash
    exchange."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.dedup import (
        canonical_dedup,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.lm import (
        fit_bigram,
        score_bigram,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.similarity import (
        knn_pq,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.timeseries import (
        gap_fill,
        resample,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    m = fit_bigram(docs)
    scored = score_bigram(docs, m, "text")
    assert_no_cartesian(scored)

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    pq = knn_pq(emb, q, k=3, m=4, nbits=4)
    assert_broadcast_join(pq)  # LUT frame + refine joins broadcast

    ev_schema_df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 1.0)], "g string, ts string, v double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = resample(ev_schema_df, "ts", "1 hour", {"n": F.count("*")}, ["g"])
    filled = gap_fill(r, "1 hour", ["n"], ["g"], fill="locf")
    plan = formatted_plan(filled)
    assert "Exchange SinglePartition" not in plan

    cd = canonical_dedup(docs, "text", "doc_id")
    plan = formatted_plan(cd)
    assert "CartesianProduct" not in plan
    # exactly one shuffle, on the hash key (formatted plans print each
    # node in the tree AND the detail section - count argument lines)
    assert plan.count("Arguments: hashpartitioning") == 1
    m.unpersist()


def test_r8_operators_plan_shape(spark, sf_small):
    """ohlc_bars must be ONE hash/sort aggregate pair around ONE
    shuffle (partial min_by/max_by map-side, no window over the full
    stream); the CDC-MV signed delta is one aggregate over the
    changelog with no cartesian."""
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.operators.timeseries import (
        ohlc_bars,
    )
    from apache_iceberg_pyiceberg_local_data_lakehouse_spark.queries import (
        load_events,
    )

    ev = load_events(spark, sf_small)
    bars = ohlc_bars(
        ev, "ts", "value", "1 hour",
        group_cols=["event_type"], tiebreak_col="event_id",
    )
    plan = formatted_plan(bars)
    assert_no_cartesian(bars)
    assert "Window" not in plan  # no full-stream window
    # one shuffle on (group, bucket); partial aggregate runs map-side
    assert plan.count("Arguments: hashpartitioning") == 1
    assert "partial_min_by" in plan
