"""R1 golden test: the LIVE HTTP front door, end to end.

Boots the stdlib ingest server on an ephemeral port, POSTs real JSON
over a real socket (urllib), flushes the micro-batch, and asserts the
standardized records landed in the parquet index and the topic log —
the reference's README.md:52-54 + :83 example driven through the
actual wire path, not a function call."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from bigdataproj_spark.sources.http_ingest import TweetIngestServer
from bigdataproj_spark.streaming.kafkalike import FileTopic


def _post(url: str, payload) -> tuple[int, dict]:
    req = urllib.request.Request(
        url + "/tweets",
        data=payload if isinstance(payload, bytes) else json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(url: str, path: str) -> tuple[int, dict]:
    try:
        with urllib.request.urlopen(url + path) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture
def server(spark, tmp_path):
    topic = FileTopic(str(tmp_path / "log"), "tweet-stream", partitions=2)
    with TweetIngestServer(
        spark, str(tmp_path / "index"), topic=topic
    ) as srv:
        yield srv, topic


def test_post_enrich_index_roundtrip(spark, server):
    srv, topic = server
    # README.md:83 example: "#New is extracted from 'Happy #New Year'"
    code, body = _post(
        srv.address,
        {
            "created_at": "2013-09-10T12:00:00Z",
            "text": "Happy #New Year",
            "user": {"id": 11, "name": "alice", "followers": 120},
            "geo": {"lat": 40.0, "lon": -105.3},
        },
    )
    assert (code, body) == (200, {"accepted": 1})
    code, _ = _post(
        srv.address,
        {"text": "the flood was slow and the damage big", "user": {"name": "bob"}},
    )
    assert code == 200
    assert srv.flush() == 2

    idx = srv.index().orderBy("tweet_id").collect()
    assert len(idx) == 2
    first = idx[0]
    assert first["hashtags"] == ["#new"]  # the README example, standardized
    assert first["user_name"] == "alice"
    assert first["lat"] == 40.0
    assert first["n_tokens"] == 3
    # deterministic lexicon (text.SENTIMENT_LEXICON): no scored words here
    assert first["sentiment"] == "neutral"
    # JSON serialization (R10) round-trips the standardized struct
    rec = json.loads(first["json"])
    assert rec["user"]["name"] == "alice"
    assert rec["sentiment_info"]["sentiment"] == "neutral"
    assert idx[1]["sentiment"] == "negative"  # slow+big outweigh

    # Kafka-sink stand-in got the same enriched records
    log = topic.read_batch(spark).collect()
    assert len(log) == 2
    vals = sorted(json.loads(bytes(r["value"])) ["tweet_id"] for r in log)
    assert vals == [1, 2]


def test_query_endpoint_filters(spark, server):
    srv, _ = server
    _post(srv.address, {"text": "fast recovery this #New year", "user": {"name": "alice"}})
    _post(srv.address, {"text": "slow sad day #gloom", "user": {"name": "bob"}})
    srv.flush()
    code, body = _get(srv.address, "/query?sentiment=positive")
    assert code == 200
    assert [r["user_name"] for r in body["rows"]] == ["alice"]
    code, body = _get(srv.address, "/query?hashtag=gloom")
    assert [r["user_name"] for r in body["rows"]] == ["bob"]
    code, body = _get(srv.address, "/query?user=alice&sentiment=positive")
    assert [r["tweet_id"] for r in body["rows"]] == [1]


def test_bad_requests_are_client_errors(spark, server):
    srv, _ = server
    code, body = _post(srv.address, b"{not json")
    assert code == 400 and "bad JSON" in body["error"]
    code, body = _post(srv.address, {"user": {"name": "x"}})
    assert code == 400 and "text" in body["error"]
    code, body = _post(srv.address, {"text": "hi", "geo": {"lat": 1.0}})
    assert code == 400 and "geo" in body["error"]
    # nothing buffered from rejected posts
    assert srv.flush() == 0
    code, body = _get(srv.address, "/nope")
    assert code == 404


def test_multibatch_appends_accumulate(spark, server):
    srv, topic = server
    _post(srv.address, [{"text": "batch one tweet"}])
    assert srv.flush() == 1
    _post(srv.address, [{"text": "batch two tweet"}, {"text": "third tweet here"}])
    assert srv.flush() == 2
    assert srv.index().count() == 3
    # ids keep increasing across batches
    assert [r["tweet_id"] for r in srv.index().orderBy("tweet_id").collect()] == [
        1,
        2,
        3,
    ]


def test_http_to_stream_end_to_end(spark, tmp_path):
    """The reference's full real-time loop, live: tweets POSTed over a
    real socket flow through the enrichment pipeline into the topic
    log, and a Structured Streaming consumer of that log (the Kafka
    source contract) aggregates sentiment counts per micro-batch —
    REST edge → pipeline → broker → stream, no stage faked."""
    import pyspark.sql.functions as SF

    topic = FileTopic(str(tmp_path / "log"), "tweet-stream", partitions=2)
    with TweetIngestServer(spark, str(tmp_path / "index"), topic=topic) as srv:
        _post(srv.address, [
            {"text": "fast help arrived", "user": {"name": "alice"}},
            {"text": "slow sad flooding", "user": {"name": "bob"}},
        ])
        srv.flush()  # micro-batch 1 -> one topic flush
        _post(srv.address, [{"text": "quiet evening by the creek", "user": {"name": "eve"}}])
        srv.flush()  # micro-batch 2

        sink = "http_stream_sink"
        q = (
            topic.read_stream(spark)
            .select(
                SF.get_json_object(
                    SF.col("value").cast("string"), "$.sentiment_info.sentiment"
                ).alias("sentiment")
            )
            .groupBy("sentiment")
            .count()
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            r["sentiment"]: r["count"] for r in spark.table(sink).collect()
        }
        assert got == {"positive": 1, "negative": 1, "neutral": 1}


def test_bad_content_length_is_400_not_crash(server):
    """A non-numeric Content-Length must produce a clean 400 (the
    header is client-controlled input), not an uncaught ValueError
    that resets the connection."""
    import http.client
    from urllib.parse import urlparse

    srv, _ = server
    u = urlparse(srv.address)
    conn = http.client.HTTPConnection(u.hostname, u.port, timeout=5)
    try:
        conn.putrequest("POST", "/tweets", skip_accept_encoding=True)
        conn.putheader("Content-Type", "application/json")
        conn.putheader("Content-Length", "not-a-number")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        assert "Content-Length" in json.loads(resp.read())["error"]
    finally:
        conn.close()


def test_accept_buffer_is_bounded(server, monkeypatch):
    """Above the accept-buffer cap the server answers 429 backpressure
    instead of growing driver memory without bound; after a flush()
    drains the buffer, ingestion resumes."""
    import bigdataproj_spark.sources.http_ingest as hi

    srv, _ = server
    monkeypatch.setattr(hi, "_MAX_BUFFER", 3)
    for i in range(3):
        code, _ = _post(srv.address, {"text": f"t{i} #x"})
        assert code == 200
    code, body = _post(srv.address, {"text": "overflow #x"})
    assert code == 429
    assert "buffer full" in body["error"]
    assert srv.flush() == 3
    code, _ = _post(srv.address, {"text": "after-flush #x"})
    assert code == 200
