"""Corpus-curation pipeline: every drop is staged, reasoned, and the
survivors are exactly the documents no stage rejects."""

from __future__ import annotations

from data_pipeline_project_using_telegram_and_aws_spark.operators.curation import curate_corpus

GOOD = "the quick brown fox jumps over the lazy dog near the river bank"
NEAR = "the quick brown fox jumps over the lazy dog near the river shore"


def _docs(spark):
    rows = [
        (1, GOOD, "en"),
        (2, GOOD, "en"),            # exact dup of 1
        (3, NEAR, "en"),            # near dup of 1 (one token differs)
        (4, "short text here", "en"),            # < 5 tokens → quality
        (5, "!!! ??? ... ;;; ,,, !!! ??? ...", "en"),  # punct junk
        (6, "ein ganz anderer text mit vielen verschiedenen neuen worten",
         "de"),                     # fine but wrong language
        (7, "completely different content about spark query engines and "
            "distributed joins for large scale analytics", "en"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_curation_stages_and_ledger(spark):
    kept, ledger = curate_corpus(
        _docs(spark),
        jaccard_threshold=0.5,
        min_tokens=5,
        keep_langs=["en"],
    )
    assert sorted(r.doc_id for r in kept.collect()) == [1, 7]
    entries = {r.doc_id: (r.stage, r.reason) for r in ledger.collect()}
    assert set(entries) == {2, 3, 4, 5, 6}
    assert entries[2][0] == "exact_dedup"
    assert entries[3][0] == "near_dedup" and "vs doc 1" in entries[3][1]
    assert entries[4] == ("quality", "too_short")
    assert entries[5] == ("quality", "punct_ratio")
    assert entries[6] == ("language", "lang=de")


def test_curation_drops_each_doc_exactly_once(spark):
    kept, ledger = curate_corpus(
        _docs(spark), jaccard_threshold=0.5, keep_langs=["en"]
    )
    dropped = [r.doc_id for r in ledger.collect()]
    assert len(dropped) == len(set(dropped))
    kept_ids = {r.doc_id for r in kept.collect()}
    assert kept_ids.isdisjoint(dropped)
    assert kept_ids | set(dropped) == {1, 2, 3, 4, 5, 6, 7}


def test_near_dedup_kept_alive_flag(spark):
    """kept_alive marks whether the referenced keeper survived the
    near-dup stage: in a chain A~B, B~C drop-all-doc_b removes both B
    and C; B's keeper (A) is alive, C's keeper (B) is not."""
    chain = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta", "en"),
            (2, "alpha beta gamma delta epsilon zeta eta iota", "en"),
            (3, "alpha beta gamma delta epsilon zeta mu iota", "en"),
        ],
        ["doc_id", "text", "lang"],
    )
    _, ledger = curate_corpus(chain, jaccard_threshold=0.2, min_tokens=1)
    near = {r.doc_id: r.kept_alive for r in ledger.collect()
            if r.stage == "near_dedup"}
    assert near.get(2) is True         # keeper doc 1 survived
    if 3 in near:                      # doc 3's keeper may be doc 1 or 2
        reasons = {r.doc_id: r.reason for r in ledger.collect()}
        if "vs doc 2" in reasons[3]:
            assert near[3] is False    # doc 2 was itself dropped
        else:
            assert near[3] is True


def test_winnow_strategy_parity_with_lsh_on_overlap_corpus(spark):
    """near_dup_strategy='winnow' plugs the winnowing fingerprint-overlap
    candidate generator into the same drop-every-doc_b + ledger
    machinery: on the overlap corpus (doc 3 near-verbatim of doc 1) both
    strategies drop the same documents at the same stages, and the
    winnow ledger row carries its own score vocabulary."""
    docs = _docs(spark)
    kept_m, ledger_m = curate_corpus(
        docs, jaccard_threshold=0.5, min_tokens=5, keep_langs=["en"]
    )
    kept_w, ledger_w = curate_corpus(
        docs,
        jaccard_threshold=0.5,
        min_tokens=5,
        keep_langs=["en"],
        near_dup_strategy="winnow",
    )
    assert sorted(r.doc_id for r in kept_w.collect()) == sorted(
        r.doc_id for r in kept_m.collect()
    )
    stages_m = {r.doc_id: r.stage for r in ledger_m.collect()}
    stages_w = {r.doc_id: r.stage for r in ledger_w.collect()}
    assert stages_w == stages_m
    near_w = {r.doc_id: r.reason for r in ledger_w.collect()
              if r.stage == "near_dedup"}
    assert near_w and all(
        reason.startswith("winnow overlap=") and "vs doc" in reason
        for reason in near_w.values()
    )


def test_unknown_near_dup_strategy_rejected(spark):
    import pytest

    with pytest.raises(ValueError, match="near_dup_strategy"):
        curate_corpus(_docs(spark), near_dup_strategy="simhash")


def test_lm_quality_gate_drops_offdomain_docs(spark):
    """The optional perplexity gate: an off-domain doc scores far above
    the in-domain corpus under the reference model and is dropped at the
    lm_quality stage with its 4-dp score in the reason; stage order is
    preserved (a too-short doc never reaches the LM stage)."""
    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog", "en")
         for i in range(100, 120)],
        ["doc_id", "text", "lang"],
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the dog", "en"),
            (2, "zxqv wkrp mblt qqzz vvkk nnpp", "en"),   # fully OOV
            (3, "shorty", "en"),                          # quality: too_short
        ],
        ["doc_id", "text", "lang"],
    )
    kept, ledger = curate_corpus(
        docs,
        jaccard_threshold=0.99,
        min_tokens=5,
        max_bits_per_token=6.0,
        lm_ref=ref,
    )
    assert sorted(r.doc_id for r in kept.collect()) == [1]
    entries = {r.doc_id: (r.stage, r.reason) for r in ledger.collect()}
    assert entries[3] == ("quality", "too_short")
    assert entries[2][0] == "lm_quality"
    assert entries[2][1].startswith("bits_per_token=")
    assert float(entries[2][1].split("=")[1]) > 6.0


def test_repetition_gate_drops_stuffed_docs(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.curation import (
        curate_corpus,
    )

    normal = " ".join(f"w{i} x{i} y{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, normal, "en"),
            # one token dominates: top-token share well over the bound
            # (vocab disjoint from doc 1 so near-dedup can't claim it)
            (2, "spam " * 12 + " ".join(f"q{i} r{i}" for i in range(6)), "en"),
            # a repeated 6-token phrase: duplicate-trigram fraction high
            # but every token's share stays ~1/6 (below the 0.3 bound),
            # so the trigram signal is the one that fires
            (3, "m1 m2 m3 m4 m5 m6 " * 6, "en"),
        ],
        ["doc_id", "text", "lang"],
    )
    kept, ledger = curate_corpus(
        docs,
        min_tokens=3,
        max_dup_trigram_frac=0.5,
        max_top_token_share=0.3,
    )
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    by_stage = {
        r.doc_id: (r.stage, r.reason) for r in ledger.collect()
    }
    assert 1 in kept_ids
    assert by_stage[2][0] == "repetition"
    assert by_stage[2][1].startswith("top_token_share=")
    assert by_stage[3][0] == "repetition"
    assert by_stage[3][1].startswith("dup_trigram_frac=")
    # conservation still holds with the new stage
    assert kept_ids | set(by_stage) == {1, 2, 3}
    assert not (kept_ids & set(by_stage))


def test_repetition_gate_passes_short_docs(spark):
    from data_pipeline_project_using_telegram_and_aws_spark.operators.curation import (
        curate_corpus,
    )

    docs = spark.createDataFrame(
        [(1, "aa bb cc dd ee", "en")], ["doc_id", "text", "lang"]
    )
    kept, ledger = curate_corpus(
        docs, min_tokens=3, max_dup_trigram_frac=0.01,
        max_top_token_share=0.9,
    )
    # all-distinct trigrams: dup fraction 0, passes even a tight bound
    assert kept.count() == 1 and ledger.count() == 0


def test_compressibility_gate_in_curation(spark):
    """Enabled gate: the planted template-spam doc drops with stage
    'compressibility' and the ratio in the reason; default-off leaves
    the pipeline byte-identical (cu1's oracle contract)."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.curation import (
        curate_corpus,
    )

    prose = (
        "the study recorded seventeen distinct gull species along the "
        "harbor wall during a cold november survey of nesting habits"
    )
    spam = "buy now click here " * 30
    df = spark.createDataFrame(
        [(1, prose, "en"), (2, spam, "en")], ["doc_id", "text", "lang"]
    )
    kept, ledger = curate_corpus(
        df,
        min_tokens=2,
        jaccard_threshold=0.95,
        compressibility_bounds=(0.2, 0.9),
    )
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert kept_ids == {1}
    row = [r for r in ledger.collect() if r["doc_id"] == 2]
    assert len(row) == 1
    assert row[0]["stage"] == "compressibility"
    assert row[0]["reason"].startswith("zlib_ratio=")

    # defaults: gate absent, both docs survive curation unchanged
    kept_default, _ = curate_corpus(
        df, min_tokens=2, jaccard_threshold=0.95
    )
    assert {r["doc_id"] for r in kept_default.collect()} == {1, 2}


def test_line_cleanup_stage_raises_exact_dedup_recall(spark):
    """Stage 0 ordering payoff: two documents identical except one
    carries the site banner hash-collide AFTER cleanup, so exact dedup
    catches what the raw-text hash would miss; survivors carry cleaned
    text; defaults-off leaves text untouched."""
    banner = "Accept cookies"
    rows = [(i, f"{banner}\nfiller document {i}") for i in range(2, 12)]
    rows += [
        (0, f"{banner}\nshared article body"),
        (1, "shared article body"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # without cleanup: docs 0 and 1 differ byte-wise → both survive
    kept_raw, _ = curate_corpus(
        docs, min_tokens=1, jaccard_threshold=1.01
    )
    assert {0, 1} <= {r["doc_id"] for r in kept_raw.collect()}
    assert banner in {
        r["text"] for r in kept_raw.filter("doc_id = 0").collect()
    }.pop()

    # with boilerplate removal first: they collide, lowest id wins
    kept, ledger = curate_corpus(
        docs,
        min_tokens=1,
        jaccard_threshold=1.01,
        boilerplate={"min_docs": 3, "frac": 0.5},
    )
    ids = {r["doc_id"] for r in kept.collect()}
    assert 0 in ids and 1 not in ids
    led = {r["doc_id"]: r for r in ledger.collect()}
    assert led[1]["stage"] == "exact_dedup"
    # survivors carry CLEANED text
    texts = {r["doc_id"]: r["text"] for r in kept.collect()}
    assert texts[0] == "shared article body"
    assert all(banner not in t for t in texts.values())


from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

_texts = st.lists(
    st.one_of(
        st.sampled_from(
            [
                "the quick brown fox jumps over the dog",
                "the quick brown fox jumps over the dog",  # dup bait
                "spam spam spam spam spam spam",
                "x",                                        # too short
                "!!!???...;;;:::",                          # punct bait
                "ein kleiner deutscher satz mit worten",
            ]
        ),
        st.text(
            alphabet="abcdef ,.!", min_size=0, max_size=60
        ),
    ),
    min_size=1,
    max_size=15,
)


@settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(_texts, st.sampled_from([0.3, 0.8]), st.booleans())
def test_curation_conservation_model(spark, texts, jt, components):
    """Model-based pipeline invariants on arbitrary corpora: every
    input document lands in EXACTLY one of kept/ledger (no loss, no
    double-drop), ledger stages come from the known stage set, and
    every exact-duplicate group keeps exactly its lowest id."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).withColumn("lang", F.lit("en"))
    kept, ledger = curate_corpus(
        docs,
        jaccard_threshold=jt,
        min_tokens=2,
        near_dup_closure="components" if components else "drop_all",
    )
    kept_ids = [r["doc_id"] for r in kept.collect()]
    led = ledger.collect()
    led_ids = [r["doc_id"] for r in led]
    assert len(set(kept_ids)) == len(kept_ids)
    assert len(set(led_ids)) == len(led_ids)  # dropped exactly once
    assert set(kept_ids) | set(led_ids) == set(range(len(texts)))
    assert set(kept_ids) & set(led_ids) == set()
    assert {r["stage"] for r in led} <= {
        "exact_dedup", "near_dedup", "quality", "language",
    }
    # exact-duplicate groups: lowest id survives stage 1 (it may still
    # drop LATER, but never with stage exact_dedup)
    by_text: dict = {}
    for i, t in enumerate(texts):
        by_text.setdefault(t, []).append(i)
    exact_drops = {
        r["doc_id"] for r in led if r["stage"] == "exact_dedup"
    }
    for ids in by_text.values():
        assert min(ids) not in exact_drops
        # every non-minimal member IS an exact-dedup drop
        assert all(i in exact_drops for i in ids if i != min(ids))


def test_language_model_gate_in_curation(spark):
    """keep_langs with a fitted train_langid model: the language stage
    gates on the MODEL's prediction instead of a precomputed lang
    column — on a separable fixture the off-language docs drop with
    stage 'language' and a lang_pred= reason naming the predicted
    language, while the on-language docs survive with full text."""
    from data_pipeline_project_using_telegram_and_aws_spark.operators.curation import curate_corpus
    from data_pipeline_project_using_telegram_and_aws_spark.operators.langid import train_langid

    words = {
        "en": ["the", "query", "table", "fast", "window", "filter"],
        "zh": ["数据", "查询", "表格", "快速", "窗口", "过滤"],
    }
    train_rows = []
    did = 10_000
    for lang, ws in words.items():
        for i in range(50):
            train_rows.append(
                (did, " ".join(ws[(i + j) % len(ws)] for j in range(10)), lang)
            )
            did += 1
    model = train_langid(
        spark.createDataFrame(
            train_rows, "doc_id long, text string, lang string"
        ),
        n=2,
        n_features=1 << 12,
        max_iter=30,
    )

    docs = spark.createDataFrame(
        [
            (1, "the fast query window over the filter table goes fast"),
            (2, "数据 查询 表格 快速 窗口 过滤 数据 查询 表格 快速"),
            (3, "query the table with the fast window filter query now"),
        ],
        "doc_id long, text string",
    )
    kept, ledger = curate_corpus(
        docs,
        min_tokens=2,
        keep_langs=["en"],
        language_model=model,
        language_model_kwargs={"n": 2},
    )
    assert {r["doc_id"] for r in kept.collect()} == {1, 3}
    led = {r["doc_id"]: r for r in ledger.collect()}
    assert led[2]["stage"] == "language"
    assert led[2]["reason"] == "lang_pred=zh"


def test_exact_substr_transform_in_curation(spark):
    """exact_substr_k cuts every corpus-repeated >=k run BEFORE the
    gates: both carriers keep their unique prose minus the shared
    paragraph, a doc that WAS only the shared paragraph hollows out
    and dies at too_short (which names the death), and the exact-dedup
    hash sees cleaned text."""
    shared = (
        "this exact promotional paragraph appears verbatim in several "
        "documents and must be cut from all of them before training "
    )
    docs = spark.createDataFrame(
        [
            (1, "unique first document body with plenty of words here "
                + shared + "and a unique tail for document one", "en"),
            (2, shared + "second document unique content follows the "
                "shared header with enough distinct words", "en"),
            (3, shared, "en"),  # nothing but the shared span
        ],
        "doc_id int, text string, lang string",
    )
    kept, ledger = curate_corpus(
        docs,
        min_tokens=5,
        jaccard_threshold=0.95,
        exact_substr_k=40,
    )
    kept_rows = {r.doc_id: r.text for r in kept.collect()}
    assert set(kept_rows) == {1, 2}
    for t in kept_rows.values():
        assert "promotional paragraph" not in t
    assert "unique tail for document one" in kept_rows[1]
    assert "second document unique content" in kept_rows[2]
    entries = {r.doc_id: (r.stage, r.reason) for r in ledger.collect()}
    assert entries[3] == ("quality", "too_short")
    # transform off → the shared paragraph survives in kept docs
    kept_off, _ = curate_corpus(
        docs, min_tokens=5, jaccard_threshold=0.95
    )
    assert any(
        "promotional paragraph" in r.text for r in kept_off.collect()
    )
