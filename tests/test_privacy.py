"""k-anonymity suppression semantics (engine parity is the oracle
gate's job; this pins the release guarantee itself)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quacfka_service_spark.operators.privacy import K_ANON, k_anonymize
from quacfka_service_spark.session import load_table

SF_DIR = "/root/testdata/sf0.001"


def _quasi(spark):
    return load_table(spark, SF_DIR, "documents").select(
        "source", "lang", F.expr("CAST(n_chars DIV 100 AS STRING)").alias("len_bin")
    )


def test_k_floor_holds_and_suppression_is_exercised(spark):
    docs = _quasi(spark)
    out = k_anonymize(docs).collect()
    sup = [r for r in out if "<SUPPRESSED>" in (r["source"], r["lang"], r["len_bin"])]
    released = [r for r in out if r not in sup]
    # every released row describes >= k documents
    assert all(r["n_docs"] >= K_ANON for r in released)
    # the fixture actually has rare combinations — not a vacuous pass
    assert sup, "fixture produced no group under k; quasi-ids too coarse"
    # suppressed rows recode EVERY quasi-identifier, so the remainder
    # is one fully-generalized bucket
    assert len(sup) == 1
    assert (sup[0]["source"], sup[0]["lang"], sup[0]["len_bin"]) == (
        "<SUPPRESSED>",
    ) * 3
    # conservation: nothing dropped, nothing double-counted
    assert sum(r["n_docs"] for r in out) == docs.count()


def test_no_released_combination_is_rare_in_the_source(spark):
    """The linkage guarantee: for every released (non-suppressed)
    combination, the raw corpus really contains >= k matching docs."""
    docs = _quasi(spark)
    raw = {
        (r["source"], r["lang"], r["len_bin"]): r["n"]
        for r in docs.groupBy("source", "lang", "len_bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    out = k_anonymize(docs).collect()
    for r in out:
        key = (r["source"], r["lang"], r["len_bin"])
        if "<SUPPRESSED>" not in key:
            assert raw[key] == r["n_docs"] >= K_ANON


def test_t_closeness_planted_skew(spark):
    """A planted skewed group must fail t-closeness while a group
    mirroring the global distribution passes — the similarity-attack
    scenario the audit exists to catch.  Hand-computable fixture:
    global = 6xEN + 2xFR (ratio 3:1); 'mirror' matches the ratio
    exactly, 'skew' is all-EN, 'rest' is a single-FR singleton."""
    from quacfka_service_spark.operators.privacy import t_closeness

    rows = (
        # group 'mirror': 3 EN, 1 FR  (= the 3:1 global ratio)
        [("mirror", "b0", "en")] * 3
        + [("mirror", "b0", "fr")]
        # group 'skew': 3 EN, 0 FR (all-EN — maximally skewed vs 3:1)
        + [("skew", "b0", "en")] * 3
        # remainder fills the global ratio to 6:2
        + [("rest", "b0", "fr")]
    )
    docs = spark.createDataFrame(rows, "source string, len_bin string, lang string")
    out = {
        r["source"]: r
        for r in t_closeness(
            docs, quasi=("source", "len_bin"), sensitive="lang"
        ).collect()
    }
    # global: n=8, en=6, fr=2.
    # mirror (n_c=4, en=3, fr=1): |3*8-6*4| + |1*8-2*4| = 0 -> t=0, passes
    assert out["mirror"]["tv_num"] == 0
    assert out["mirror"]["t_close"] == 0.0
    assert out["mirror"]["meets_t"]
    # skew (n_c=3, en=3, fr=0): |3*8-6*3| + |0*8-2*3| = 6+6 = 12
    # t = 12/(2*3*8) = 0.25 <= 0.3 -> passes but nonzero
    assert out["skew"]["tv_num"] == 12
    assert abs(out["skew"]["t_close"] - 0.25) < 1e-12
    assert out["skew"]["meets_t"]
    # rest (n_c=1, en=0, fr=1): |0*8-6*1| + |1*8-2*1| = 6+6 = 12
    # t = 12/(2*1*8) = 0.75 > 0.3 -> FAILS the gate
    assert out["rest"]["tv_num"] == 12
    assert abs(out["rest"]["t_close"] - 0.75) < 1e-12
    assert not out["rest"]["meets_t"]


def test_t_closeness_conservation_on_fixture(spark):
    """Every quasi-group appears exactly once and n_docs conserves."""
    from quacfka_service_spark.operators.privacy import t_closeness

    docs = load_table(spark, SF_DIR, "documents").select(
        "source",
        F.expr("CAST(n_chars DIV 100 AS STRING)").alias("len_bin"),
        "lang",
    )
    out = t_closeness(docs).collect()
    assert sum(r["n_docs"] for r in out) == docs.count()
    assert all(r["tv_num"] >= 0 for r in out)
    assert all(0.0 <= r["t_close"] <= 1.0 for r in out)


def test_t_closeness_null_sensitive_is_a_category(spark):
    """ADVICE r9 #4: NULL sensitive values coalesce to a sentinel
    category, so tv_num respects its 2*n_c*n bound (t_close <= 1)
    instead of double-counting NULL docs as missing class mass AND
    global surplus."""
    from quacfka_service_spark.operators.privacy import t_closeness

    rows = [
        ("a", "0", None), ("a", "0", None), ("a", "0", "en"),
        ("b", "0", "fr"), ("b", "0", None), ("b", "0", "fr"),
    ]
    docs = spark.createDataFrame(rows, "source string, len_bin string, lang string")
    out = {(r["source"], r["len_bin"]): r for r in t_closeness(docs).collect()}
    assert all(0.0 <= r["t_close"] <= 1.0 for r in out.values())
    # group a: dist {<NULL>: 2/3, en: 1/3}; global {<NULL>: 1/2,
    # en: 1/6, fr: 1/3} -> TV = (|2/3-1/2| + |1/3-1/6| + |0-1/3|)/2
    # = 1/3; tv_num = 2*n_c*n*TV = 2*3*6*(1/3) = 12
    assert out[("a", "0")]["tv_num"] == 12
    assert abs(out[("a", "0")]["t_close"] - 1 / 3) < 1e-12
