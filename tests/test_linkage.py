"""Fuzzy linkage pins: normalization, the two default block routes
(phonetic + first-token), similarity parity with a Python Levenshtein,
blocking-recall honesty (an alias sharing no block stays invisible),
the block guard, and clustering composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_project_using_telegram_and_aws_spark.operators.linkage import (
    fuzzy_pairs,
    normalize_name,
)

PEOPLE = [
    (1, "John Smith"),
    (2, "john  smith "),       # normalization twin
    (3, "Jon Smith"),          # phonetic route (soundex J500)
    (4, "John Smyth"),         # first-token route + phonetic
    (5, "Smith, John"),        # neither block route reaches 1 (honesty)
    (6, "Alice Jones"),
]


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(PEOPLE, ["pid", "name"])


def test_normalization(spark):
    got = spark.createDataFrame(
        [("  John--SMITH  Jr. ",)], ["s"]
    ).select(normalize_name(F.col("s")).alias("n")).collect()[0]["n"]
    assert got == "john smith jr"


def test_matches_and_similarity_values(spark, people):
    pairs = {
        (r["id_a"], r["id_b"]): r["similarity"]
        for r in fuzzy_pairs(
            people, "pid", "name", min_similarity=0.7
        ).collect()
    }
    assert pairs[(1, 2)] == 1.0          # identical after normalization
    # "john smith" vs "jon smith": 1 edit / len 10
    assert pairs[(1, 3)] == round(1 - 1 / 10, 4)
    assert (1, 4) in pairs               # smyth ~ smith
    assert not any(6 in p for p in pairs)  # alice matches nobody
    # honesty: "smith john" shares no soundex-of-string or first token
    # with "john smith" — invisible to the default blocks
    assert not any(5 in p for p in pairs)


def test_block_guard_and_validation(spark, people):
    with pytest.raises(ValueError):
        fuzzy_pairs(people, "pid", "name", min_similarity=0.0)
    tiny_guard = fuzzy_pairs(
        people, "pid", "name", min_similarity=0.7, max_block_rows=2
    )
    with pytest.raises(Exception, match="max_block_rows"):
        tiny_guard.collect()


def test_clusters_via_components(spark, people):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.components import (
        connected_components,
    )

    pairs = fuzzy_pairs(people, "pid", "name", min_similarity=0.7)
    labels = {
        r["node"]: r["component"]
        for r in connected_components(pairs, "id_a", "id_b").collect()
    }
    # 1-2-3-4 form one entity cluster labeled by the min id
    assert labels[2] == labels[3] == labels[4] == labels[1] == 1
