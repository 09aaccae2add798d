"""Physical-plan quality gates: Catalyst must push filters into the
parquet scans, prune columns, and pick broadcast joins where we hint
them.  These assertions are the '.explain and iterate' loop frozen
into CI so regressions in plan shape fail loudly."""

from pyspark.sql import functions as F

from cloud_based_web_crawling_indexing_system_spark.plans import probes

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_q01_filter_pushdown_and_column_pruning(spark):
    df = probes.registry()["q01_pricing_summary"](spark, SF)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # scan must read only the columns the query needs, never all 11
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    for col in ("l_orderkey", "l_partkey", "l_suppkey", "l_tax"):
        assert col not in read_schema
    assert "l_quantity" in read_schema and "l_returnflag" in read_schema


def test_q03_broadcast_joins(spark):
    plan = _plan(probes.registry()["q03_region_customer_rollup"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2  # both dims broadcast
    assert "SortMergeJoin" not in plan


def test_q04_anti_join_shape(spark):
    # merged routes probe: the anti route keeps LeftAnti, the semi
    # route keeps LeftSemi — folding must not degrade either plan
    plan = _plan(probes.registry()["q04_customer_order_join_routes"](spark, SF))
    assert "LeftAnti" in plan
    assert "LeftSemi" in plan


def test_q21_and_query_rides_the_scan(spark):
    # r7 shape: the three-literal-term AND is per-row regexp_count
    # folds — no postings build, no join, and the only exchange is
    # the final ORDER BY's
    plan = _plan(probes.registry()["q21_search_and"](spark, SF))
    assert "Join" not in plan
    assert plan.count("Exchange") <= 1


def test_q27_topk_window_and_broadcast(spark):
    plan = _plan(probes.q27_builtin_route(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_q37_df_cap_is_window_over_pair_join_exchange(spark):
    """The hot-shingle cap must cost ZERO extra shuffles of the corpus
    relation: the df count is a WINDOW over hash(shingle) — the very
    Exchange the pair self-join requires anyway — never a separate df
    aggregation + anti/broadcast join of a second shingle copy (r7
    shape; both routes ride ONE flagged pair join)."""
    df = probes.registry()["q37_ngram_jaccard_routes"](spark, SF)
    df.collect()  # AQE finalizes join strategies on execution
    plan = _plan(df)
    assert "Window" in plan, plan[:2000]
    # one pair self-join serves both routes
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1
    # no broadcast of a hot set, no anti join
    assert "LeftAnti" not in plan


def test_whole_stage_codegen_on_relational_core(spark):
    df = probes.registry()["q01_pricing_summary"](spark, SF)
    df.collect()  # AQE finalizes the plan only on execution
    plan = _plan(df)
    # '*(n)' marks whole-stage-codegen'd operators; the agg+filter
    # pipeline must be inside one, and partial aggregation (map-side
    # combine) must precede the exchange
    assert "*(1) HashAggregate" in plan and "partial_sum" in plan
    assert "AQEShuffleRead coalesced" in plan or "Exchange hashpartitioning" in plan


def test_crawl_fetch_broadcasts_frontier_not_pages(spark, tiny_corpus, tmp_path):
    """The fetch join must broadcast the (bounded) admitted frontier and
    stream the pages corpus — never shuffle pages."""
    from cloud_based_web_crawling_indexing_system_spark.operators.crawl import CrawlRun
    from cloud_based_web_crawling_indexing_system_spark.oracle import CrawlConfig

    run = CrawlRun(spark, str(tmp_path / "planrun"), CrawlConfig(round_budget_s=1e9))
    run.init(
        tiny_corpus["pages"],
        spark.read.parquet(tiny_corpus["robots"]),
        spark.read.parquet(tiny_corpus["seeds"]),
    )
    run.step()
    # reconstruct the round-1 fetch plan the engine would build
    f = run.frontier.read_round(1).drop("round")
    fetched = run._pages_df.join(F.broadcast(f), "url", "inner")
    plan = _plan(fetched)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "Exchange hashpartitioning(url" not in plan
    # pages scan pruned to exactly (url, html)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "html" in read_schema and "warc_ts" not in read_schema and "text" not in read_schema


def test_read_all_is_one_scan_over_n_rounds(spark, tiny_corpus, tmp_path):
    """RoundTable.read_all must plan ONE partitioned parquet scan no
    matter how many rounds are committed — not an O(#rounds) union
    (the planner blow-up at thousands of rounds)."""
    from cloud_based_web_crawling_indexing_system_spark.operators.crawl import CrawlRun
    from cloud_based_web_crawling_indexing_system_spark.oracle import CrawlConfig

    run = CrawlRun(spark, str(tmp_path / "scanrun"), CrawlConfig(round_budget_s=8.0))
    run.init(
        tiny_corpus["pages"],
        spark.read.parquet(tiny_corpus["robots"]),
        spark.read.parquet(tiny_corpus["seeds"]),
    )
    run.run(max_rounds=5)
    n_rounds = len(run.frontier.committed_rounds())
    assert n_rounds >= 5
    df = run.frontier.read_all()
    plan = _plan(df)
    assert plan.count("Scan parquet") == 1
    assert "Union" not in plan
    # the round partition column materializes correctly
    got = sorted(r["round"] for r in df.select("round").distinct().collect())
    assert got == run.frontier.committed_rounds()
    # pruned read: upto/after filters restrict the partitions listed
    part = run.frontier.read_all(upto=2, after=0)
    rounds = {r["round"] for r in part.select("round").distinct().collect()}
    assert rounds == {1, 2}
    assert _plan(part).count("Scan parquet") == 1


def test_q24_single_aggregation_subtree(spark):
    """The LSH band build must be one pass over the corpus (one Arrow
    stage emitting all 4 band rows per doc), not a 4-way union
    re-planning the shingle->minhash work per band.  r7 shape: the
    signature+banding is a single MapInPandas over per-doc distinct
    shingle arrays — the shingle stream is never exploded row-wise."""
    df = probes.registry()["q24_minhash_lsh_pairs"](spark, SF)
    plan = _plan(df)
    assert "Union" not in plan
    assert plan.count("MapInPandas") <= 2  # a+b sides of the self-join
    # only the pair-count aggregation remains JVM-side
    assert plan.count("HashAggregate") <= 4


def test_codec_probes_shuffle_free_and_bpe_python_free(spark):
    """Scale shapes of the round-4 probes: the codec roundtrips
    (q41/q43 pre-aggregation stages) are pure narrow Arrow map
    chains — zero Exchange — and the BPE count (q42) stays entirely
    JVM-side (no Python evaluation node anywhere in its plan)."""
    for name in ("q41_image_decode_roundtrip", "q43_audio_decode_roundtrip"):
        plan = _plan(probes.registry()[name](spark, SF))
        assert "Exchange" not in plan, name  # encode->decode never shuffles

    plan = _plan(probes.q42_chain_route(spark, SF))
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan


def test_r5_sibling_probe_plan_shapes(spark):
    """Round-5 scale siblings keep the shapes their docstrings claim:

    - q54 (four-container video demux, absorbed q44/q45): beyond the
      one fixture-generation repartition + the final per-(doc,
      container) agg, the mux->demux chain is narrow Arrow stages —
      no other Exchange;
    - q46 (production BPE): exactly one Arrow-batched Python stage
      (the merge-loop UDF), no row-at-a-time eval;
    - q47 (approx quantiles): ONE aggregation, NO window, NO
      row_number — the whole point vs q39's exact window route."""
    plan = _plan(probes.registry()["q54_container_frame_sample"](spark, SF))
    assert plan.count("Exchange") <= 2  # id repartition + final agg
    assert plan.count("MapInPandas") == 2  # encode stage + frame_sample

    plan = _plan(probes.q42_ranksdict_route(spark, SF))
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan  # never the row-at-a-time path

    plan = _plan(probes.q39_approx_route(spark, SF))
    assert "Window" not in plan and "row_number" not in plan
    assert "percentile_approx" in plan
    # q39 (the exact baseline) DOES carry the window — the contrast is
    # the documented crossover
    assert "Window" in _plan(probes.q39_exact_route(spark, SF))


def test_search_term_filter_reaches_parquet_scan(spark, tmp_path):
    """A4 at scale: the search's literal term-IN predicate must land in
    the postings parquet scan's DataFilters (the broadcast semi-join
    alone cannot push down), so term-clustered checkpoints prune row
    groups instead of scanning every postings file per search."""
    import pandas as pd

    from cloud_based_web_crawling_indexing_system_spark.plans.search_query import (
        compile_search,
    )

    pdir = str(tmp_path / "postings")
    pd.DataFrame(
        {
            "term": ["data", "engin", "zebra"],
            "job_id": ["j"] * 3,
            "url": ["u1", "u1", "u2"],
            "url_hash": ["h1", "h1", "h2"],
            "frequency": [3, 1, 9],
        }
    ).to_parquet(pdir)
    postings = spark.read.parquet(pdir)
    df = compile_search(spark, postings, "data engine", limit=5)
    assert [r["url"] for r in df.collect()] == ["u1"]
    # read the FINAL adaptive plan (the pre-execution string elides the
    # subtree under AdaptiveSparkPlan isFinalPlan=false)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert scans and any("term" in l and " IN " in l for l in scans), plan[:3000]
