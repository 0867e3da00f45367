from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
    assign_split,
    hash_fraction,
    split_report,
)


def _ids(spark, n=2000):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_fraction_matches_python_reference(spark):
    rows = (
        _ids(spark, 50)
        .select("doc_id", hash_fraction("doc_id").alias("f"))
        .collect()
    )
    for r in rows:
        hex6 = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:6]
        assert abs(r["f"] - int(hex6, 16) / 16**6) < 1e-12
        assert 0.0 <= r["f"] < 1.0


def test_split_proportions_and_stability(spark):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = assign_split(_ids(spark), w)
    report = {r["split"]: r for r in split_report(out).collect()}
    assert set(report) == {"train", "val", "test"}
    assert abs(report["train"]["fraction"] - 0.8) < 0.05
    # pure function of the id: same assignment on a differently
    # partitioned input (the property randomSplit lacks)
    again = assign_split(_ids(spark).repartition(13), w)
    diff = (
        out.withColumnRenamed("split", "s1")
        .join(again.withColumnRenamed("split", "s2"), "doc_id")
        .filter(F.col("s1") != F.col("s2"))
        .count()
    )
    assert diff == 0


def test_salt_decorrelates(spark):
    w = {"a": 0.5, "b": 0.5}
    one = assign_split(_ids(spark), w).withColumnRenamed("split", "s1")
    two = assign_split(_ids(spark), w, salt="x").withColumnRenamed(
        "split", "s2"
    )
    agree = (
        one.join(two, "doc_id").filter(F.col("s1") == F.col("s2")).count()
    )
    # independent coin flips agree ~50%; identical splits would be 100%
    assert 800 < agree < 1200


def test_no_shuffle_in_plan(spark):
    out = assign_split(_ids(spark), {"train": 0.9, "holdout": 0.1})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def _sourced(spark, n=3000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 3).cast("string")).alias("source"),
    )


def test_mixture_proportions(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
        weighted_mixture,
    )

    df = _sourced(spark)  # 1000 rows per source
    out = weighted_mixture(
        df, {"src0": 0.5, "src1": 2.5, "src2": 0.0}
    )
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert abs(counts["src0"] - 500) < 80
    assert abs(counts["src1"] - 2500) < 80
    assert "src2" not in counts
    # oversampling: epochs 0 and 1 are complete, epoch 2 is the half
    epochs = {
        r["epoch"]: r["n"]
        for r in out.filter("source = 'src1'")
        .groupBy("epoch")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert epochs[0] == 1000 and epochs[1] == 1000
    assert abs(epochs[2] - 500) < 80


def test_mixture_deterministic_and_nested(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
        weighted_mixture,
    )

    df = _sourced(spark)
    a = set(
        r["doc_id"]
        for r in weighted_mixture(df, {"src0": 0.25}, default_rate=0.0).collect()
    )
    b = set(
        r["doc_id"]
        for r in weighted_mixture(
            df.repartition(7), {"src0": 0.5}, default_rate=0.0
        ).collect()
    )
    assert a  # nonempty
    # narrowing the rate keeps survivors a subset of the wider rate's,
    # and the assignment is partitioning-independent
    assert a <= b


def test_take_per_group_exact_counts_and_stability(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
        deterministic_take_per_group,
    )

    rows = [(i, f"src{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    took = deterministic_take_per_group(df, "source", 5)
    per = {}
    for r in took.collect():
        per.setdefault(r.source, set()).add(r.doc_id)
    assert all(len(v) == 5 for v in per.values()) and len(per) == 3

    # deterministic: same input, same selection
    again = deterministic_take_per_group(df, "source", 5)
    per2 = {}
    for r in again.collect():
        per2.setdefault(r.source, set()).add(r.doc_id)
    assert per == per2

    # short groups return whole group, never pad
    small = spark.createDataFrame([(1, "a"), (2, "a")], ["doc_id", "source"])
    assert deterministic_take_per_group(small, "source", 5).count() == 2


def test_take_per_group_append_stability(spark):
    """Appending rows only swaps selections where a new id hashes
    earlier — the kept set from the smaller corpus is NOT reshuffled
    wholesale."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
        deterministic_take_per_group,
    )

    base = spark.createDataFrame(
        [(i, "s") for i in range(40)], ["doc_id", "source"]
    )
    bigger = spark.createDataFrame(
        [(i, "s") for i in range(50)], ["doc_id", "source"]
    )
    a = {r.doc_id for r in deterministic_take_per_group(base, "source", 10).collect()}
    b = {r.doc_id for r in deterministic_take_per_group(bigger, "source", 10).collect()}
    # the overlap is exactly the old picks that still rank <= 10
    assert len(a) == len(b) == 10
    assert len(a & b) >= 5  # md5 order: most survive a 25% append


class TestTemperatureSample:
    def _docs(self, spark, n=4000):
        from pyspark.sql import functions as F

        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            # half the corpus at full quality, half at 0.25
            F.when(F.col("id") % 2 == 0, 1.0).otherwise(0.25).alias("q"),
        )

    def test_proportions_and_tau_zero(self, spark):
        from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
            temperature_sample,
        )

        df = self._docs(spark)
        kept = temperature_sample(df, "q", tau=1.0, max_score=1.0)
        by_q = {
            r["q"]: r["n"]
            for r in kept.groupBy("q").count().withColumnRenamed("count", "n").collect()
        }
        assert by_q[1.0] == 2000              # p=1 keeps everything
        assert abs(by_q.get(0.25, 0) - 500) < 80  # p=0.25 of 2000
        assert temperature_sample(df, "q", tau=0.0, max_score=1.0).count() == 4000

    def test_monotone_in_tau_and_deterministic(self, spark):
        from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
            temperature_sample,
        )

        df = self._docs(spark)
        ids = lambda d: {r["doc_id"] for r in d.select("doc_id").collect()}
        t1 = ids(temperature_sample(df, "q", tau=1.0, max_score=1.0))
        t2 = ids(temperature_sample(df, "q", tau=2.0, max_score=1.0))
        t1b = ids(
            temperature_sample(df.repartition(13), "q", tau=1.0, max_score=1.0)
        )
        assert t2 <= t1          # sharper tau only drops more
        assert t1 == t1b         # layout-stable
        with __import__("pytest").raises(ValueError):
            temperature_sample(df, "q", tau=-1.0)

    def test_derived_max_and_null_scores(self, spark):
        from pyspark.sql import functions as F

        from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
            temperature_sample,
        )

        df = self._docs(spark).withColumn(
            "q", F.when(F.col("doc_id") < 100, None).otherwise(F.col("q") * 8.0)
        )
        kept = temperature_sample(df, "q", tau=1.0)  # max derived = 8.0
        assert kept.filter("doc_id < 100").count() == 0      # NULLs dropped
        assert kept.filter("q = 8.0").count() == 1950        # p=1 survivors


class TestTakeTokensPerGroup:
    def _docs(self, spark):
        rows = [
            (i, "s" + str(i % 3), " ".join("w" for _ in range(5 + i % 7)))
            for i in range(300)
        ]
        return spark.createDataFrame(rows, ["doc_id", "source", "text"])

    def test_matches_python_prefix_rule(self, spark):
        import hashlib

        from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
            take_tokens_per_group,
        )

        df = self._docs(spark)
        budget = 200
        got = {
            r["doc_id"]
            for r in take_tokens_per_group(df, "source", budget).collect()
        }
        want = set()
        rows = df.collect()
        by_src = {}
        for r in rows:
            by_src.setdefault(r["source"], []).append(r)
        for src, members in by_src.items():
            members.sort(
                key=lambda r: (
                    hashlib.md5(
                        f"token-budget|{r['doc_id']}".encode()
                    ).hexdigest(),
                    r["doc_id"],
                )
            )
            cum = 0
            for r in members:
                cum += len(r["text"].split())
                if cum <= budget:
                    want.add(r["doc_id"])
                else:
                    break
        assert got == want

    def test_monotone_in_budget_and_layout_stable(self, spark):
        from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
            take_tokens_per_group,
        )

        df = self._docs(spark)
        ids = lambda d: {r["doc_id"] for r in d.select("doc_id").collect()}
        small = ids(take_tokens_per_group(df, "source", 150))
        big = ids(take_tokens_per_group(df, "source", 400))
        small2 = ids(take_tokens_per_group(df.repartition(11), "source", 150))
        assert small <= big
        assert small == small2
        # a budget beyond the group mass keeps everything
        assert len(ids(take_tokens_per_group(df, "source", 10**9))) == 300
        import pytest as _pytest

        with _pytest.raises(ValueError):
            take_tokens_per_group(df, "source", -1)

    def test_budget_is_per_group(self, spark):
        from pyspark.sql import functions as F

        from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
            take_tokens_per_group,
        )

        df = self._docs(spark)
        kept = take_tokens_per_group(df, "source", 100)
        per = kept.withColumn(
            "nt", F.size(F.split("text", " "))
        ).groupBy("source").agg(F.sum("nt").alias("t")).collect()
        assert len(per) == 3
        for r in per:
            assert r["t"] <= 100


class TestWeightedTakePerGroup:
    def test_exact_count_proportionality_and_stability(self, spark):
        from pyspark.sql import functions as F

        from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
            weighted_take_per_group,
        )

        # one group, 3000 rows: weight 9 vs 1 → heavy ids ~9x likelier
        df = spark.range(3000).select(
            F.col("id").alias("doc_id"),
            F.lit("g").alias("grp"),
            F.when(F.col("id") % 2 == 0, 9.0).otherwise(1.0).alias("w"),
        )
        kept = weighted_take_per_group(df, "grp", 300, "w")
        rows = kept.collect()
        assert len(rows) == 300
        heavy = sum(1 for r in rows if r["doc_id"] % 2 == 0)
        # E[heavy] ≈ 267 under without-replacement ES sampling
        assert heavy > 230
        # deterministic across layouts
        again = weighted_take_per_group(df.repartition(17), "grp", 300, "w")
        assert {r["doc_id"] for r in rows} == {
            r["doc_id"] for r in again.collect()
        }

    def test_zero_and_null_weights_excluded(self, spark):
        import pytest as _pytest
        from pyspark.sql import functions as F

        from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
            weighted_take_per_group,
        )

        df = spark.createDataFrame(
            [(1, "g", 1.0), (2, "g", 0.0), (3, "g", None), (4, "g", -1.0)],
            ["doc_id", "grp", "w"],
        )
        kept = weighted_take_per_group(df, "grp", 10, "w")
        assert {r["doc_id"] for r in kept.collect()} == {1}
        with _pytest.raises(ValueError):
            weighted_take_per_group(df, "grp", 0, "w")


from hypothesis import HealthCheck, given, settings, strategies as st


@settings(
    max_examples=5, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),  # doc_id
            st.sampled_from(["a", "b"]),                 # group
            st.integers(min_value=0, max_value=30),      # n_tokens-ish
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=0, max_value=200),
)
def test_token_budget_properties_on_random_inputs(spark, rows, budget):
    """Properties on random corpora: (1) per-group token mass ≤ budget;
    (2) budget monotonicity (bigger budget ⊇ smaller); (3) the kept set
    is a hash-order PREFIX per group (no cherry-picking)."""
    import hashlib

    from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
        take_tokens_per_group,
    )

    df = spark.createDataFrame(
        [(i, g, " ".join("w" for _ in range(t))) for i, g, t in rows],
        ["doc_id", "source", "text"],
    )
    kept = take_tokens_per_group(df, "source", budget)
    kept_rows = kept.collect()
    mass = {}
    for r in kept_rows:
        mass[r["source"]] = mass.get(r["source"], 0) + len(
            r["text"].split()
        )
    assert all(v <= budget for v in mass.values())
    bigger = {
        r["doc_id"]
        for r in take_tokens_per_group(df, "source", budget + 40).collect()
    }
    kept_ids = {r["doc_id"] for r in kept_rows}
    assert kept_ids <= bigger
    # prefix property per group in md5(salt|id) order
    by_group: dict[str, list[int]] = {}
    for i, g, _ in rows:
        by_group.setdefault(g, []).append(i)
    for g, ids in by_group.items():
        ids.sort(
            key=lambda i: (
                hashlib.md5(f"token-budget|{i}".encode()).hexdigest(),
                i,
            )
        )
        in_kept = [i in kept_ids for i in ids]
        # once False, never True again
        assert all(
            not (not a and b) for a, b in zip(in_kept, in_kept[1:])
        )


@settings(
    max_examples=5, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        ),
        min_size=1,
        max_size=50,
        unique_by=lambda t: t[0],
    ),
)
def test_temperature_monotone_on_random_inputs(spark, rows):
    """tau-monotonicity on random scores: survivors at tau=2 ⊆ tau=1
    ⊆ tau=0 (= everything non-null)."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
        temperature_sample,
    )

    df = spark.createDataFrame(rows, ["doc_id", "q"])
    ids = lambda t: {
        r["doc_id"]
        for r in temperature_sample(
            df, "q", tau=t, max_score=1.0
        ).collect()
    }
    t0, t1, t2 = ids(0.0), ids(1.0), ids(2.0)
    assert t2 <= t1 <= t0
    assert t0 == {i for i, _ in rows}


class TestQuantileGate:
    def test_tails_dropped_and_bounds(self, spark):
        from pyspark.sql import functions as F

        from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
            quantile_gate,
        )

        df = spark.range(1000).select(
            F.col("id").alias("doc_id"), F.col("id").cast("double").alias("s")
        )
        kept = quantile_gate(df, "s", 0.1, 0.9).collect()
        ids = sorted(r["doc_id"] for r in kept)
        # ~80% survive, from the middle of the distribution
        assert 780 <= len(ids) <= 820
        assert ids[0] >= 80 and ids[-1] <= 920
        import pytest as _pytest

        with _pytest.raises(ValueError):
            quantile_gate(df, "s", 0.9, 0.1)

    def test_nulls_drop_and_degenerate_band(self, spark):
        from pyspark.sql import functions as F

        from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
            quantile_gate,
        )

        df = spark.range(100).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 10, None).otherwise(1.0).alias("s"),
        )
        kept = quantile_gate(df, "s", 0.0, 1.0)
        # constant distribution: everything non-null survives
        assert kept.count() == 90
        assert kept.filter("doc_id < 10").count() == 0


class TestLeakageSafeSplit:
    def test_groups_never_straddle_splits(self, spark):
        from pyspark.sql import functions as F

        from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
            assign_split,
            leakage_safe_split,
        )

        # 600 docs in 200 near-dup groups of 3
        df = spark.range(600).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 200).alias("dup_group"),
        )
        out = leakage_safe_split(
            df, {"train": 0.8, "holdout": 0.2}, "dup_group", salt="s"
        )
        straddlers = (
            out.groupBy("dup_group")
            .agg(F.count_distinct("split").alias("k"))
            .filter("k > 1")
            .count()
        )
        assert straddlers == 0
        # proportions hold at the GROUP level
        shares = {
            r["split"]: r["n"]
            for r in out.select("dup_group", "split")
            .distinct()
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert abs(shares["train"] - 160) < 25
        # the naive per-doc split DOES leak on the same data (the bug
        # this operator exists to prevent)
        naive = assign_split(
            df, {"train": 0.8, "holdout": 0.2}, id_col="doc_id", salt="s"
        )
        leaked = (
            naive.groupBy("dup_group")
            .agg(F.count_distinct("split").alias("k"))
            .filter("k > 1")
            .count()
        )
        assert leaked > 0


class TestSolveMixture:
    def test_arithmetic_and_binding_source(self, spark):
        from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
            solve_mixture,
        )

        sol = solve_mixture(
            {"web": 1000.0, "code": 100.0},
            {"web": 0.7, "code": 0.3},
            max_epochs=2.0,
        )
        # code binds: 100 tokens can serve at most 200/0.3 ≈ 666.7 total
        assert sol["binding_source"] == "code"
        assert abs(sol["total_tokens"] - 100 * 2 / 0.3) < 1e-6
        assert abs(sol["rates"]["code"] - 2.0) < 1e-9   # at the cap
        web_rate = 0.7 * sol["total_tokens"] / 1000
        assert abs(sol["rates"]["web"] - web_rate) < 1e-6
        assert sol["rates"]["web"] < 2.0
        import pytest as _pytest

        with _pytest.raises(ValueError):
            solve_mixture({"web": 1.0}, {"web": 0.5, "code": 0.5})
        with _pytest.raises(ValueError):
            solve_mixture({"web": 1.0}, {"web": -1.0})

    def test_composes_with_weighted_mixture(self, spark):
        from pyspark.sql import functions as F

        from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
            solve_mixture,
            weighted_mixture,
        )

        rows = [(i, "web", "w " * 10) for i in range(3000)] + [
            (i + 10_000, "code", "c " * 10) for i in range(600)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
        # docs carry equal tokens, so token mass ∝ doc count
        sol = solve_mixture(
            {"web": 3000.0, "code": 600.0},
            {"web": 0.5, "code": 0.5},
            max_epochs=2.0,
        )
        mixed = weighted_mixture(df, sol["rates"], source_col="source")
        got = {
            r["source"]: r["n"]
            for r in mixed.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        total = sum(got.values())
        # realized shares hit the target within hash-sampling noise
        assert abs(got["web"] / total - 0.5) < 0.03
        assert abs(got["code"] / total - 0.5) < 0.03
        # the binding source oversamples at ~max_epochs
        assert abs(got["code"] / 600 - 2.0) < 0.1


def test_normalize_scores_per_group(spark):
    """Per-group normalization vs a pure-Python recomputation; a
    global threshold on the normalized score selects the same relative
    band in every source despite shifted raw scales; degenerate and
    NULL handling."""
    import statistics

    from data_pipeline_project_using_telegram_and_aws_spark.operators.splits import (
        normalize_scores_per_group,
    )

    rows = []
    # source A scores ~N(0.2, .) ; source B shifted to ~N(0.8, .)
    for i in range(50):
        rows.append((i, "A", 0.2 + 0.001 * (i % 10)))
        rows.append((100 + i, "B", 0.8 + 0.001 * (i % 10)))
    rows.append((999, "A", None))
    rows.append((998, "C", 5.0))  # singleton: zero spread
    df = spark.createDataFrame(rows, "doc_id long, src string, q double")

    for method in ("robust", "zscore"):
        out = {
            r["doc_id"]: r["q_norm"]
            for r in normalize_scores_per_group(
                df, "q", ["src"], method=method
            ).collect()
        }
        assert out[999] is None
        assert out[998] == 0.0
        # python recompute for source A, robust method
        a_vals = [0.2 + 0.001 * (i % 10) for i in range(50)]
        if method == "robust":
            med = statistics.median(a_vals)
            mad = statistics.median([abs(v - med) for v in a_vals])
            want = (a_vals[7] - med) / (1.4826 * mad)
        else:
            mu = statistics.fmean(a_vals)
            sd = statistics.pstdev(a_vals)
            want = (a_vals[7] - mu) / sd
        assert abs(out[7] - want) < 1e-9
        # the same doc position in each source gets the same normalized
        # score (scales differ, shape is identical)
        assert abs(out[7] - out[107]) < 1e-9
