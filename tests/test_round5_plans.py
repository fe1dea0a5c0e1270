"""Round-5 operator properties and plan shapes.

House convention: each round's new operators get dedicated assertions
beyond the oracle-parity sweep — the MATHEMATICAL guarantee each
certificate rides on, checked under conditions the oracle run doesn't
vary (partitioning, brute-force ground truth, conservation laws).
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from spark_streaming_practicum_spark.catalog import table
from spark_streaming_practicum_spark.plans import formatted_plan
from spark_streaming_practicum_spark.registry import all_queries

from .conftest import SF_DIR, built_query

DEFS = all_queries()


# --- Misra-Gries: guarantees are partition-layout independent ----------------


def test_mg_certificates_hold_under_any_partitioning(spark):
    # The MG guarantee must survive adversarial partition counts: the
    # per-partition summaries change completely between 2 and 32
    # partitions, the three booleans must not.
    rows = built_query("sketch_misra_gries_heavyhitters", spark).collect()
    assert rows and all(
        r["mg_underestimates"]
        and r["mg_error_within_bound"]
        and r["mg_recall_complete"]
        for r in rows
    )


# --- quantile sketch: rank certificates + exactness of the audit leg ---------


def test_quantile_sketch_certificates_and_monotone(spark):
    rows = built_query("sketch_quantile_mergeable", spark).collect()
    assert [r["q"] for r in rows] == sorted(r["q"] for r in rows)
    qs = [r["exact_quantile"] for r in rows]
    assert qs == sorted(qs), "exact quantiles must be monotone in q"
    assert all(r["rank_lower_ok"] and r["rank_upper_ok"] for r in rows)


# --- ES sampling: top-k must plan as TakeOrdered, not a global sort ----------


def test_weighted_es_is_take_ordered(spark):
    plan = formatted_plan(built_query("sample_weighted_es", spark))
    assert "TakeOrderedAndProject" in plan


# --- SymSpell: delete-key blocking loses NOTHING at distance 1 ---------------


def _lev(a: str, b: str) -> int:
    # classic DP, small strings only (test-side ground truth)
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


def test_symspell_recall_equals_brute_force(spark):
    names = sorted(
        r["c_name"]
        for r in table(spark, SF_DIR, "customer").select("c_name").distinct().collect()
    )
    truth = sorted(
        (a, b)
        for a, b in itertools.combinations(names, 2)
        if _lev(a, b) == 1
    )[:200]
    got = [
        (r["name_a"], r["name_b"])
        for r in built_query("linkage_symspell_edit1", spark).collect()
    ]
    assert got == truth, (
        f"SymSpell blocking missed pairs: truth {len(truth)}, got {len(got)}"
    )


# --- grid DBSCAN: conservation + label minimality ----------------------------


def test_dbscan_conserves_points_and_labels_are_min(spark):
    rows = built_query("ml_dbscan_grid_clusters", spark).collect()
    total = table(spark, SF_DIR, "embeddings").count()
    assert sum(r["n_points"] for r in rows) == total
    labs = [r["cluster_id"] for r in rows if r["cluster_id"] != -1]
    assert len(labs) == len(set(labs))
    assert all(r["n_cells"] >= 1 for r in rows if r["cluster_id"] != -1)


# --- Markov removal: removing a channel can only lose conversion mass --------


def test_markov_removal_never_gains_conversion(spark):
    rows = built_query("attribution_markov_removal", spark).collect()
    assert rows
    for r in rows:
        assert r["p_conversion_removed"] <= r["p_conversion_base"] + 1e-12
        assert 0.0 <= r["removal_effect"] <= 1.0 + 1e-12


# --- MaxSim: broadcast topology, never an unbounded cartesian ----------------


def test_maxsim_broadcasts_queries(spark):
    plan = formatted_plan(built_query("retrieval_maxsim_late_interaction", spark))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


# --- HITS: score frames stay joined by key, normalizers broadcast ------------


def test_hits_scores_bounded_and_normalized(spark):
    rows = built_query("graph_hits_hubs_authorities", spark).collect()
    assert rows
    hubs = [r["hub"] for r in rows]
    auths = [r["authority"] for r in rows]
    assert max(hubs) == 1.0 and max(auths) == 1.0  # L-inf normalized
    assert all(0.0 <= v <= 1.0 for v in hubs + auths)


# --- Benford: distribution algebra -------------------------------------------


def test_benford_probabilities_sum_to_one(spark):
    rows = built_query("audit_benford_first_digit", spark).collect()
    assert abs(sum(r["observed_p"] for r in rows) - 1.0) < 1e-4
    assert all(r["chi2_term"] >= 0 for r in rows)
    assert [r["digit"] for r in rows] == list(range(1, 10))


# --- Apriori: downward closure actually holds in the output ------------------


def test_apriori_triples_satisfy_downward_closure(spark):
    tri = built_query("basket_apriori_triples", spark).collect()
    if not tri:
        return
    d = table(spark, SF_DIR, "documents")
    it = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("t")
    )
    n_docs = it.select("doc_id").distinct().count()
    for r in tri[:3]:  # spot-check the top rows
        for pair in ((r["item_a"], r["item_b"]), (r["item_a"], r["item_c"]), (r["item_b"], r["item_c"])):
            cnt = (
                it.filter(F.col("t") == pair[0])
                .select("doc_id")
                .join(it.filter(F.col("t") == pair[1]).select("doc_id"), "doc_id")
                .count()
            )
            assert cnt >= r["support"], "pair support below triple support"


# --- SAX: every returned pair shares its bucket word by construction ---------


def test_sax_pairs_share_word_and_distance_bounded(spark):
    rows = built_query("ts_sax_motif_pairs", spark).collect()
    from spark_streaming_practicum_spark.operators.timeseries import _SAX_DIST_MAX

    for r in rows:
        assert r["znorm_dist"] <= _SAX_DIST_MAX + 1e-9
        assert len(r["word"]) > 0


# --- Yannakakis: reduction pass is semijoins + broadcasts, never a wide SMJ --


def test_yannakakis_plan_is_semijoin_reduced(spark):
    plan = formatted_plan(built_query("join_yannakakis_semijoin_reduce", spark))
    assert "LeftSemi" in plan, "reduction pass must be a semijoin"
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "reduced fact must never wide-shuffle here"


def test_yannakakis_matches_plain_join(spark):
    # Same answer as the unreduced 4-way join (Yannakakis is a pure
    # physical rewrite).
    red = {
        (r["n_name"], r["n_orders"], round(r["revenue"], 4))
        for r in built_query("join_yannakakis_semijoin_reduce", spark).collect()
    }
    o = table(spark, SF_DIR, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    plain = (
        o.join(table(spark, SF_DIR, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(table(spark, SF_DIR, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(table(spark, SF_DIR, "region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double").alias("revenue"),
        )
    )
    exp = {(r["n_name"], r["n_orders"], round(r["revenue"], 4)) for r in plain.collect()}
    assert red == exp


# --- zone-map audit: clustering must actually buy skipping -------------------


def test_zonemap_date_clustering_skips_most_rows(spark):
    rows = built_query("opt_zonemap_skipping_audit", spark).collect()
    by = {(r["layout"], r["zone_class"]): r for r in rows}
    # natural layout: orderkey chunks are date-uncorrelated -> nothing skips
    assert ("natural", "skip") not in by
    # date-clustered layout: out-of-window months all skip
    nat_total = sum(r["n_rows"] for r in rows if r["layout"] == "natural")
    dc_skip = by.get(("date_clustered", "skip"))
    assert dc_skip is not None and dc_skip["n_rows"] > nat_total * 0.5


# --- running distinct: one shuffle, no per-row growing set -------------------


def test_running_distinct_single_exchange_no_collect_set(spark):
    df = built_query("window_running_distinct_types", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # once the cached frame has executed, AQE prints "== Final Plan ==" +
    # "== Initial Plan ==" sections; judge the final plan only
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Exchange") == 1, "both windows must reuse the user_id shuffle"
    assert "collect_set" not in plan
    # per-user final value equals the user's true distinct-type count
    final = (
        df.groupBy("user_id").agg(F.max("n_types_so_far").alias("got")).collect()
    )
    truth = {
        r["user_id"]: r["n"]
        for r in table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("n"))
        .collect()
    }
    assert all(truth[r["user_id"]] == r["got"] for r in final)


# --- weighted median: crossing-point definition holds ------------------------


def test_weighted_median_is_weight_crossing_point(spark):
    rows = built_query("agg_weighted_median_groups", spark).collect()
    li = table(spark, SF_DIR, "lineitem")
    for r in rows:
        flag, med = r["flag"], r["weighted_median"]
        g = li.filter(F.col("l_returnflag") == flag)
        tot = g.agg(F.sum("l_quantity")).collect()[0][0]
        below = g.filter(F.col("l_extendedprice") < med).agg(F.sum("l_quantity")).collect()[0][0] or 0
        upto = g.filter(F.col("l_extendedprice") <= med).agg(F.sum("l_quantity")).collect()[0][0]
        # smallest crossing point: strictly-below mass < half <= mass up to it
        assert 2 * below < tot <= 2 * upto


# --- CBO cardinality audit: key joins must be near-exact ---------------------


def test_join_cardinality_qerror_tight_on_key_joins(spark):
    rows = {r["join_name"]: r for r in built_query("opt_join_cardinality_estimate", spark).collect()}
    # orders.custkey -> customer.custkey is a PK-FK join: the textbook
    # estimator must be exact (q_error == 1.0); same for lineitem->orders.
    assert rows["orders_x_customer"]["q_error"] == 1.0
    assert rows["lineitem_x_orders"]["q_error"] == 1.0
    assert rows["lineitem_x_part"]["q_error"] < 1.5


# --- constellation fingerprint: bucketed join only, finds true near-dups -----


def test_constellation_match_is_bucketed_and_finds_neardups(spark):
    df = built_query("mm_audio_constellation_match", spark)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    rows = df.collect()
    assert rows, "corpus has near-dups; the fingerprint index must find some"
    # alignment score can never exceed total matches
    assert all(r["aligned_matches"] <= r["total_matches"] for r in rows)
    # the strongest match must be a genuinely similar pair
    import difflib

    best = max(rows, key=lambda r: r["aligned_matches"])
    texts = {
        r["doc_id"]: r["text"]
        for r in table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id").isin([best["doc_a"], best["doc_b"]]))
        .collect()
    }
    sim = difflib.SequenceMatcher(None, texts[best["doc_a"]], texts[best["doc_b"]]).ratio()
    assert sim > 0.5, f"top fingerprint match is not similar (ratio={sim})"


# --- Holt: applyInPandas shape + the recurrence's defining identity ----------


def test_holt_forecast_is_prev_level_plus_trend(spark):
    rows = built_query("ts_holt_linear_forecast", spark).collect()
    by_series = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["day"])):
        by_series.setdefault(r["event_type"], []).append(r)
    assert by_series
    for series in by_series.values():
        assert series[0]["forecast"] is None  # no forecast before data
        for prev, cur in zip(series, series[1:]):
            assert cur["forecast"] is not None
            # one-step forecast == previous level + previous trend (mod rounding)
            assert abs(cur["forecast"] - (prev["level"] + prev["trend"])) < 2e-6


def test_holt_plan_is_grouped_pandas(spark):
    plan = built_query("ts_holt_linear_forecast", spark)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan  # series = parallel unit


# --- GMM EM: mixture algebra after one step ----------------------------------


def test_gmm_step_is_valid_mixture(spark):
    row = built_query("ml_gmm_em_step", spark).collect()[0]
    assert abs(row["w1_new"] + row["w2_new"] - 1.0) < 1e-5
    assert row["mu1_new"] < row["mu2_new"]  # symmetric init keeps order
    assert row["sigma1_new"] > 0 and row["sigma2_new"] > 0


# --- OLS normal equations: must agree with numpy lstsq -----------------------


def test_ols_matches_numpy_lstsq(spark):
    import numpy as np

    row = built_query("ml_ols_normal_equation", spark).collect()[0]
    pdf = (
        table(spark, SF_DIR, "lineitem")
        .select("l_quantity", "l_discount", "l_extendedprice")
        .toPandas()
    )
    X = np.column_stack(
        [np.ones(len(pdf)), pdf["l_quantity"].values, pdf["l_discount"].values]
    )
    beta, *_ = np.linalg.lstsq(X, pdf["l_extendedprice"].values, rcond=None)
    assert abs(row["b0"] - beta[0]) < 1e-3
    assert abs(row["b1"] - beta[1]) < 1e-3
    assert abs(row["b2"] - beta[2]) < 1e-3
    assert 0.0 <= row["r2"] <= 1.0


# --- random walk: edges real, result partition-invariant ---------------------


def test_random_walk_hops_are_real_edges_and_deterministic(spark):
    df = built_query("graph_random_walk_deterministic", spark)
    rows = {(r["c0"], r["s1"], r["c2"], r["s3"]) for r in df.collect()}
    assert rows
    edges = {
        (r["c"], r["s"])
        for r in table(spark, SF_DIR, "lineitem")
        .join(table(spark, SF_DIR, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .collect()
    }
    for c0, s1, c2, s3 in rows:
        assert (c0, s1) in edges and (c2, s1) in edges and (c2, s3) in edges
    # partition-count invariance: the walk is a function of the graph only
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        rows3 = {
            (r["c0"], r["s1"], r["c2"], r["s3"])
            for r in DEFS["graph_random_walk_deterministic"].fn(spark, SF_DIR).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert rows3 == rows


# --- Bloom FPR audit: defining filter guarantees -----------------------------


def test_bloom_audit_certificates(spark):
    row = built_query("sketch_bloom_fpr_audit", spark).collect()[0]
    assert row["no_false_negatives"] is True  # Bloom's hard guarantee
    assert row["bits_set"] <= 16384  # filter relation bounded by m
    assert row["n_probes"] > 0
    # empirical FPR sane vs fill-ratio theory (deterministic hashes over
    # sequential keys can sit below theory; never wildly above). The
    # additive floor is binomial sampling noise: with n probes a single
    # chance hit contributes 1/n, so allow 2/n — at sf0.001's 150
    # probes one false positive (0.0067) is noise, not a bug.
    noise_floor = max(0.005, 2.0 / row["n_probes"])
    assert row["empirical_fpr"] <= 4 * row["theoretical_fpr"] + noise_floor


# --- RAKE: phrases are stopword-free, ranking is dense per doc ---------------


def test_rake_phrases_stopword_free_and_ranked(spark):
    from spark_streaming_practicum_spark.functions.textfns import EN_STOPWORDS

    rows = built_query("text_rake_keyphrases", spark).collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
        assert not (set(r["phrase"].split()) & set(EN_STOPWORDS))
    for doc_rows in by_doc.values():
        rks = sorted(r["rk"] for r in doc_rows)
        assert rks == list(range(1, len(rks) + 1))  # dense 1..k
        ordered = sorted(doc_rows, key=lambda r: r["rk"])
        scores = [r["rake_score"] for r in ordered]
        assert scores == sorted(scores, reverse=True)


# --- eager aggregation: the pre-agg must reach the customer join reduced -----


def test_eager_agg_joins_partial_aggregate(spark):
    df = built_query("opt_agg_pushdown_eager", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    # two HashAggregate levels for the pre-agg + final rollup
    assert plan.count("HashAggregate") >= 3
    # equality against the join-then-agg formulation
    o = table(spark, SF_DIR, "orders")
    c = table(spark, SF_DIR, "customer")
    n = table(spark, SF_DIR, "nation")
    plain = {
        (r["n_name"], r["n_orders"], round(r["revenue"], 4))
        for r in o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double").alias("revenue"),
        )
        .collect()
    }
    got = {(r["n_name"], r["n_orders"], round(r["revenue"], 4)) for r in df.collect()}
    assert got == plain


# --- interval islands: coverage algebra --------------------------------------


def test_interval_islands_invariants(spark):
    rows = built_query("ts_interval_islands_merge", spark).collect()
    assert rows
    per_supp_ship_days = {
        r["k"]: (r["n"], r["span"])
        for r in table(spark, SF_DIR, "lineitem")
        .groupBy(F.col("l_suppkey").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.datediff(F.max("l_shipdate"), F.min("l_shipdate")) + 7).alias("span"),
        )
        .collect()
    }
    for r in rows:
        n, span = per_supp_ship_days[r["suppkey"]]
        assert 1 <= r["n_islands"] <= n
        assert r["max_intervals_in_island"] <= n
        # busy days: at least one island span (7d), at most the full hull
        assert 7 <= r["busy_days"] <= span
        # each island covers >= 7 days, so busy_days >= 7 * n_islands
        assert r["busy_days"] >= 7 * r["n_islands"]


# --- CUPED: variance can only shrink, by exactly rho^2 -----------------------


def test_cuped_variance_identity(spark):
    row = built_query("ab_cuped_variance_reduction", spark).collect()[0]
    assert 0.0 <= row["variance_reduction"] <= 1.0
    assert row["var_cuped"] <= row["var_post"]
    # var_cuped == var_post * (1 - rho^2), up to output rounding
    assert abs(
        row["var_cuped"] - row["var_post"] * (1 - row["variance_reduction"])
    ) <= max(1e-3, row["var_post"] * 1e-5)


# --- clustering coefficient: bounded, consistent with triangle count ---------


def test_clustering_coefficient_bounds(spark):
    rows = built_query("graph_clustering_coefficient", spark).collect()
    assert len(rows) == 25  # every nation reported
    for r in rows:
        assert 0.0 <= r["clustering_coeff"] <= 1.0
        if r["degree"] < 2:
            assert r["clustering_coeff"] == 0.0
    tri = {
        r["nation"]: r["n_triangles"]
        for r in built_query("graph_triangle_count", spark).collect()
    }
    for r in rows:
        assert r["n_triangles"] == tri[r["nation"]]


# --- stupid backoff: self-scored corpus must have finite, negative scores ----


def test_stupid_backoff_scores_negative_and_complete(spark):
    rows = built_query("lm_stupid_backoff_trigram", spark).collect()
    n_docs = (
        table(spark, SF_DIR, "documents")
        .filter(F.size(F.split("text", r"\s+")) >= 3)
        .count()
    )
    assert len(rows) == n_docs  # every >=3-token doc scored
    for r in rows:
        assert r["avg_logprob"] < 0.0  # probabilities < 1
        assert r["n_scored"] >= 1


# --- hysteresis: latch semantics replayed correctly --------------------------


def test_hysteresis_matches_sequential_replay(spark):
    rows = built_query("window_alert_hysteresis", spark).collect()
    ev = sorted(
        table(spark, SF_DIR, "events")
        .select("user_id", "event_id", "ts", "value")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    got = {(r["user_id"], r["event_id"]): r["alert_state"] for r in rows}
    state, cur_user = 0, None
    for r in ev:
        if r["user_id"] != cur_user:
            cur_user, state = r["user_id"], 0
        if r["value"] > 80.0:
            state = 1
        elif r["value"] < 30.0:
            state = 0
        assert got[(r["user_id"], r["event_id"])] == state


# --- session variables: plan folds the variable into the scan ----------------


def test_session_variables_pushdown(spark):
    df = built_query("sql_session_variables", spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    # the date_cutoff variable must fold to a pushable literal filter
    assert "PushedFilters" in plan and "o_orderdate" in plan.split("PushedFilters")[1][:300]


# --- hysteresis: the streaming latch must equal the batch window rewrite -----


def test_hysteresis_batch_stream_parity(spark):
    ev = {
        (r["user_id"], r["event_id"]): r
        for r in table(spark, SF_DIR, "events")
        .select("user_id", "event_id", "ts")
        .collect()
    }
    batch = built_query("window_alert_hysteresis", spark).collect()
    per_user = {}
    for r in batch:
        key = (r["user_id"], r["event_id"])
        per_user.setdefault(r["user_id"], []).append(
            (ev[key]["ts"], r["event_id"], r["alert_state"])
        )
    expected = set()
    for uid, rows in per_user.items():
        rows.sort()
        expected.add(
            (uid, len(rows), rows[-1][2], sum(st for _, _, st in rows))
        )
    got = {
        (r["user_id"], r["n_seen"], r["alert_state"], r["n_alert_events"])
        for r in built_query("stream_tws_alert_hysteresis", spark).collect()
    }
    assert got == expected
