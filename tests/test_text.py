"""Unit tests for the text operators, including the reference's single
worked example (reference README.md:83: hashtag extraction on
"Happy #New Year" yields #New) — the only executable spec the
reference contains (SURVEY.md §5.1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataproj_spark.operators.pipeline import (
    TWEETS,
    add_sentiment,
    extract_metadata,
    ingest_tweets,
    standardize,
)
from bigdataproj_spark.operators.text import fingerprint, hashtags, tokens


def test_reference_hashtag_example(spark):
    """The README.md:83 worked example, verbatim."""
    df = spark.createDataFrame([("Happy #New Year",)], "text string")
    got = df.select(hashtags("text").alias("tags")).first()["tags"]
    assert got == ["#New"]


def test_hashtag_edge_cases(spark):
    cases = [
        ("no tags here", []),
        ("#a #b #a", ["#a", "#b", "#a"]),  # duplicates preserved at extract
        ("trailing#notag", ["#notag"]),  # \w+ boundary only
        # \w is ASCII in both Java regex and DuckDB's RE2 — non-ASCII
        # tag chars don't match, consistently on both engines.
        ("unicode #Üben ok", []),
        ("", []),
    ]
    df = spark.createDataFrame(cases, "text string, want array<string>")
    rows = df.select(hashtags("text").alias("got"), "want").collect()
    for r in rows:
        assert r["got"] == r["want"]


def test_tokenizer_empties_and_unicode(spark):
    df = spark.createDataFrame(
        [("  Many   spaces\t and\nnewlines  ",), ("",), ("Üben GROSS klein",)],
        "text string",
    )
    got = [r[0] for r in df.select(tokens("text")).collect()]
    assert got[0] == ["many", "spaces", "and", "newlines"]
    assert got[1] == []
    assert got[2] == ["üben", "gross", "klein"]


def test_fingerprint_whitespace_invariance(spark):
    df = spark.createDataFrame(
        [("a  b\tc",), ("A B C",), ("a b d",)], "text string"
    )
    fps = [r[0] for r in df.select(fingerprint("text")).collect()]
    assert fps[0] == fps[1]  # case + whitespace normalized
    assert fps[0] != fps[2]


def test_pipeline_sentiment_labels(spark):
    """Lexicon scorer on the inline fixture: 'fast'(+2) beats
    'slow'(-2); mixed 'slow but steady' is negative; no hits →
    neutral."""
    df = add_sentiment(extract_metadata(ingest_tweets(spark)))
    by_id = {r["tweet_id"]: r for r in df.collect()}
    assert by_id[2]["sentiment"] == "positive"  # "flood was fast"
    assert by_id[8]["sentiment"] == "negative"  # "such a slow day"
    assert by_id[4]["sentiment"] == "neutral"  # "stay safe everyone"


def test_standardized_output_shape(spark):
    """R9: the standardized record carries the fields the reference
    declares (sentiment, hashtags, geo, user — README.md:95-97)."""
    df = standardize(add_sentiment(extract_metadata(ingest_tweets(spark))))
    names = set(df.schema.fieldNames())
    assert {"tweet_id", "sentiment_info", "hashtags", "geo_info", "user"} <= names
    row = df.filter(F.col("tweet_id") == 1).first()
    assert row["hashtags"] == ["#new"]
    assert row["geo_info"]["is_geotagged"] is True
    assert row["user"]["name"] == "alice"


def test_skipgram_pairs_are_symmetric_in_total(spark, sf_dir):
    """r12: the (center, context) relation at distance d is symmetric —
    whenever BOTH a pair and its mirror clear the count floor, their
    counts must be equal (the floor can hide one side, so only
    co-surviving mirrors are compared)."""
    from bigdataproj_spark.operators.text import q08_skipgram_pairs

    pdf = q08_skipgram_pairs(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert set(pdf["dist"]) <= {1, 2}
    m = {(r.center, r.context, r.dist): r.n_pairs for r in pdf.itertuples()}
    # mirrored pairs that also cleared the floor must carry equal counts
    for (c, x, d), n in m.items():
        if (x, c, d) in m:
            assert m[(x, c, d)] == n


def test_vocab_ids_are_dense_and_frequency_ranked(spark, sf_dir):
    """r13: ids are 0..N-1 with tf non-increasing along id order."""
    from bigdataproj_spark.operators.text import r117_vocab_build

    pdf = r117_vocab_build(spark, sf_dir).toPandas().sort_values("token_id")
    assert list(pdf["token_id"]) == list(range(len(pdf)))
    assert (pdf["tf"].diff().dropna() <= 0).all()


def test_encode_ids_roundtrip_against_vocab(spark, sf_dir):
    """r14: decoding the id string through the vocab reproduces the
    in-vocab prefix tokens of every document."""
    from pyspark.sql import functions as F

    from bigdataproj_spark.catalog import table
    from bigdataproj_spark.operators.text import (
        _ENC_PREFIX,
        r117_vocab_build,
        r118_encode_ids,
        tokens,
    )

    vocab = {
        r.token_id: r.token
        for r in r117_vocab_build(spark, sf_dir).collect()
    }
    toks = {
        r.doc_id: r.toks[:_ENC_PREFIX]
        for r in table(spark, sf_dir, "documents")
        .select("doc_id", tokens("text").alias("toks"))
        .filter(F.size("toks") > 0)
        .collect()
    }
    enc = r118_encode_ids(spark, sf_dir).toPandas()
    assert len(enc) == len(toks)
    for r in enc.itertuples():
        ids = [int(x) for x in r.ids.split(",")]
        assert len(ids) == len(toks[r.doc_id])
        assert sum(1 for i in ids if i == -1) == r.n_oov
        for i, tok in zip(ids, toks[r.doc_id]):
            if i != -1:
                assert vocab[i] == tok


def test_skipgram_pairs_symmetric(spark, sf_dir):
    """Pair generation emits both directions, so the count table must
    be exactly symmetric: n(a,b,d) == n(b,a,d) for every surviving
    pair (the HAVING floor cannot break symmetry because both
    directions have identical counts)."""
    from bigdataproj_spark.operators.text import q08_skipgram_pairs

    pdf = q08_skipgram_pairs(spark, sf_dir).toPandas()
    fwd = {(r.center, r.context, r.dist): r.n_pairs for r in pdf.itertuples()}
    for (a, b, d), n in fwd.items():
        assert fwd.get((b, a, d)) == n, (a, b, d)


def test_bigram_lm_probabilities_valid(spark, sf_dir):
    """Conditional probabilities are proper: in (0, 1), c1 >= c12,
    and add-one smoothing keeps p monotone in c12 for fixed w1."""
    from bigdataproj_spark.operators.text import r120_bigram_lm

    pdf = r120_bigram_lm(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert ((pdf["p_cond"] > 0) & (pdf["p_cond"] < 1)).all()
    assert (pdf["c1"] >= pdf["c12"]).all()
    for _, g in pdf.groupby("w1"):
        gs = g.sort_values("c12")
        assert gs["p_cond"].is_monotonic_increasing
