"""Text-analysis operator tests (token counting, ratios, lang-ID,
fingerprints) on small synthetic docs with known properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from hierarchical_to_relational_spark.operators import text as tx


DOCS = [
    (1, "the cat and the dog sat of the mat in it"),
    (2, "der Hund und die Katze ist nicht mit das"),
    (3, "!!! ??? ###"),
    (4, ""),
    (5, "le chat et la maison dans les jardins est une"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_token_counts(spark):
    rows = {r["doc_id"]: r for r in _df(spark).select(
        "doc_id",
        tx.ws_token_count("text").alias("ws"),
        tx.bpe_ish_token_count("text").alias("bpe"),
    ).collect()}
    assert rows[1]["ws"] == 11
    assert rows[4]["ws"] == 0
    assert rows[3]["ws"] == 3
    assert rows[3]["bpe"] == 9  # each punct char is its own token


def test_punct_ratio_bounds(spark):
    rows = {r["doc_id"]: r["p"] for r in _df(spark).select("doc_id", tx.punct_ratio("text").alias("p")).collect()}
    assert rows[3] == 1.0
    assert rows[1] == 0.0
    assert rows[4] == 0.0


def test_lang_id(spark):
    rows = {r["doc_id"]: r["lang"] for r in _df(spark).select("doc_id", tx.lang_id("text").alias("lang")).collect()}
    assert rows[1] == "en"
    assert rows[2] == "de"
    assert rows[5] == "fr"
    assert rows[3] == "und"
    assert rows[4] == "und"


def test_quality_score_ordering(spark):
    rows = {r["doc_id"]: r["q"] for r in _df(spark).select("doc_id", tx.quality_score("text").alias("q")).collect()}
    assert rows[1] > rows[3]  # real prose beats punctuation soup
    assert 0.0 <= min(rows.values()) and max(rows.values()) <= 1.0


def test_rolling_fingerprint_stability(spark):
    """Same content → same fingerprint; different content → different;
    short docs fall back to whole-text hash."""
    df = spark.createDataFrame(
        [(1, "hello world this is a doc"), (2, "hello world this is a doc"), (3, "completely different"), (4, "abc")],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r["fp"] for r in df.select("doc_id", tx.rolling_fingerprint("text").alias("fp")).collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]
    assert rows[4] is not None


def test_profile_single_pass(spark):
    out = tx.profile_documents(_df(spark))
    assert {"n_tokens_ws", "n_tokens_bpe", "punct_ratio", "stopword_ratio", "lang_guess", "quality", "fingerprint"} <= set(out.columns)
    assert out.count() == len(DOCS)
    # single scan, no exchange in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_fingerprint_production_hash_variant(spark):
    """xxhash64 fingerprint (production path): same stability contract as
    the md5 contract form — equal content → equal, different → different,
    short-doc fallback — at integer-hash cost."""
    df = spark.createDataFrame(
        [(1, "hello world this is a doc"), (2, "hello world this is a doc"),
         (3, "completely different"), (4, "abc")],
        "doc_id int, text string",
    )
    for hash_fn in ("xxhash64", "md5"):
        rows = {r["doc_id"]: r["fp"] for r in
                df.select("doc_id", tx.rolling_fingerprint("text", hash_fn=hash_fn).alias("fp")).collect()}
        assert rows[1] == rows[2] and rows[1] != rows[3] and rows[4] is not None
    # production profile defaults to the integer fingerprint
    fp_type = dict(tx.profile_documents(df).dtypes)["fingerprint"]
    assert fp_type == "bigint"


def test_stopword_hits_word_boundary_equivalence(spark):
    """The shared-token-scan stopword count must equal the word-bounded
    regex form on boundary-tricky inputs (digit/underscore-adjacent words,
    punctuation, apostrophes)."""
    from pyspark.sql import functions as F
    from hierarchical_to_relational_spark.operators.text import LANG_STOPWORDS

    rows = [(1, "the quick the1 the_ the, the. it's to2 to _to to"),
            (2, "THE The tHe them lathe the"),
            (3, ""), (4, "und los la le")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    for lang in LANG_STOPWORDS:
        pat = r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"
        regex_form = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(pat), 0))
        got = df.select("doc_id", tx.stopword_hits("text", lang).alias("a"),
                        regex_form.alias("b")).collect()
        for r in got:
            assert r["a"] == r["b"], (lang, r)
