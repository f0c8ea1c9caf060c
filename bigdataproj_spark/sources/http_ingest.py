"""R1: the live HTTP ingest endpoint — the reference's front door.

The reference runs an Akka HTTP server on :8080 exposing POST /tweets
(reference README.md:52-54, 108-110): a JSON tweet in, enrichment
through the NLP/metadata pipeline, the standardized record out to
Kafka and the Elasticsearch index. This module is that server on the
Python stdlib (``http.server.ThreadingHTTPServer`` — no external
deps), wired to the engine's own stages:

    POST /tweets ──> accept buffer ──flush()──> ingest (TWEET schema)
        → extract_metadata → add_sentiment → standardize → to_json
        → parquet index append (the ES stand-in, sources/sink.py)
        → FileTopic JSON segment (the Kafka stand-in, streaming/kafkalike.py)

    GET /query?sentiment=…&hashtag=…&user=… ──> predicate read of the
        index (R13's query-by surface) returning JSON rows.

Design notes, 100 TB posture:
- The HANDLER threads only parse+buffer (microseconds per request);
  all Spark work happens at flush(), one micro-batch per call — the
  same accept-buffer/flush split Structured Streaming's socket-ish
  sources use. A deployment calls flush() on a timer or hands the
  buffer to ``readStream`` via the topic log; the per-request path
  never touches the driver's JVM.
- Appends are atomic at micro-batch granularity: parquet append mode
  writes new files only, and the topic segment publishes by rename —
  a reader of either store sees whole batches.
- This server is an INGEST EDGE, not a distributed service: one
  instance per driver, horizontal scale = N edges each producing to
  the shared topic log (exactly the reference's N-producers-one-topic
  shape).
"""

from __future__ import annotations

import json
import threading
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.pipeline import (
    add_sentiment,
    extract_metadata,
    standardize,
    to_json_records,
)
from ..schemas import TWEET
from ..streaming.kafkalike import FileTopic

_MAX_BODY = 1 << 20  # 1 MiB per request; oversized payloads get 413
_MAX_BUFFER = 100_000  # accept-buffer row cap between flush() calls; 429 above
_QUERY_LIMIT = 100  # GET /query result cap (an API page, not an export)
_BODY_TIMEOUT_S = 10.0  # socket timeout while reading a request body


def _parse_tweet(payload: dict, next_id: int) -> tuple:
    """JSON tweet (README.md:79 shape) → TWEET-schema tuple.
    Raises ValueError with a client-facing message on bad input."""
    if not isinstance(payload, dict):
        raise ValueError("tweet must be a JSON object")
    text = payload.get("text")
    if not isinstance(text, str) or not text:
        raise ValueError("missing required field: text")
    created = payload.get("created_at")
    if created is None:
        ts = datetime.now(timezone.utc)
    else:
        try:
            ts = datetime.fromisoformat(str(created).replace("Z", "+00:00"))
        except ValueError as e:
            raise ValueError(f"bad created_at: {e}") from e
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=timezone.utc)
    user = payload.get("user") or {}
    if not isinstance(user, dict):
        raise ValueError("user must be a JSON object")
    geo = payload.get("geo")
    geo_t = None
    if geo is not None:
        try:
            geo_t = (float(geo["lat"]), float(geo["lon"]))
        except (KeyError, TypeError, ValueError) as e:
            raise ValueError(f"bad geo: {e}") from e
    try:
        # every client-controlled conversion funnels to the 400 path —
        # a list-valued tweet_id must not kill the handler thread
        return (
            int(payload.get("tweet_id", next_id)),
            ts,
            text,
            (
                int(user.get("id", 0)),
                str(user.get("name", "")),
                int(user.get("followers", 0)),
            ),
            geo_t,
            str(payload.get("lang", "en")),
        )
    except (TypeError, ValueError) as e:
        raise ValueError(f"bad tweet field: {e}") from e


class TweetIngestServer:
    """The /tweets endpoint bound to an engine pipeline.

    ``port=0`` binds an ephemeral port (tests); the reference's
    deployment shape is ``port=8080``. Not started until
    :meth:`start`; always :meth:`stop` (or use as a context manager).
    """

    def __init__(
        self,
        spark: SparkSession,
        index_path: str,
        topic: FileTopic | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self.spark = spark
        self.index_path = index_path
        self.topic = topic
        self._buf: list[tuple] = []
        self._lock = threading.Lock()
        self._next_id = 1
        self._accepted = 0
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test output
                pass

            def _reply(self, code: int, obj: dict) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                if urlparse(self.path).path != "/tweets":
                    return self._reply(404, {"error": "unknown endpoint"})
                # Content-Length is client-controlled: a non-numeric
                # value is a 400, not an uncaught ValueError; a negative
                # one clamps to 0. The read runs under a socket timeout
                # so an overstated length (client sends fewer bytes and
                # stalls) cannot pin this handler thread forever.
                try:
                    n = max(0, int(self.headers.get("Content-Length", 0)))
                except ValueError:
                    return self._reply(400, {"error": "bad Content-Length"})
                if n > _MAX_BODY:
                    return self._reply(413, {"error": "payload too large"})
                self.connection.settimeout(_BODY_TIMEOUT_S)
                try:
                    body = self.rfile.read(n)
                except TimeoutError:
                    return self._reply(408, {"error": "body read timed out"})
                try:
                    payload = json.loads(body)
                except json.JSONDecodeError as e:
                    return self._reply(400, {"error": f"bad JSON: {e}"})
                tweets = payload if isinstance(payload, list) else [payload]
                rows = []
                try:
                    with server._lock:
                        # Bounded accept buffer (the same discipline as
                        # the engine's assert-bounded collects): above
                        # the cap the client gets backpressure (429,
                        # like Kafka's buffer-full producer error), not
                        # unbounded driver memory growth.
                        if len(server._buf) + len(tweets) > _MAX_BUFFER:
                            return self._reply(
                                429, {"error": "ingest buffer full; flush pending"}
                            )
                        nid = server._next_id
                        for t in tweets:
                            rows.append(_parse_tweet(t, nid))
                            nid = max(nid, rows[-1][0]) + 1
                        server._buf.extend(rows)
                        server._next_id = nid
                        server._accepted += len(rows)
                except ValueError as e:
                    return self._reply(400, {"error": str(e)})
                self._reply(200, {"accepted": len(rows)})

            def do_GET(self):
                u = urlparse(self.path)
                if u.path != "/query":
                    return self._reply(404, {"error": "unknown endpoint"})
                try:
                    rows = server.query(
                        **{
                            k: v[0]
                            for k, v in parse_qs(u.query).items()
                            if k in ("sentiment", "hashtag", "user")
                        }
                    )
                except Exception as e:  # index may not exist yet
                    return self._reply(400, {"error": str(e)})
                self._reply(200, {"rows": rows})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="tweet-ingest", daemon=True
        )

    # -- lifecycle -----------------------------------------------------

    @property
    def address(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "TweetIngestServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=5)

    def __enter__(self) -> "TweetIngestServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- pipeline ------------------------------------------------------

    def flush(self) -> int:
        """Drain the accept buffer through the enrichment pipeline into
        the parquet index (+ topic log if configured); returns the
        number of tweets processed. One call = one micro-batch."""
        with self._lock:
            rows, self._buf = self._buf, []
        if not rows:
            return 0
        df = self.spark.createDataFrame(rows, TWEET)
        std = to_json_records(standardize(add_sentiment(extract_metadata(df))))
        flat = std.select(
            "tweet_id",
            "created_at",
            F.col("user.name").alias("user_name"),
            F.col("sentiment_info.sentiment").alias("sentiment"),
            F.col("sentiment_info.sentiment_score").alias("sentiment_score"),
            "hashtags",
            F.col("geo_info.lat").alias("lat"),
            F.col("geo_info.lon").alias("lon"),
            "n_tokens",
            "json",
        )
        flat.write.mode("append").partitionBy("sentiment").parquet(self.index_path)
        if self.topic is not None:
            self.topic.produce_df(
                std.select(F.col("tweet_id").alias("k"), F.col("json").alias("v")),
                "k",
                "v",
            )
        return len(rows)

    def index(self) -> DataFrame:
        """Open the enriched-tweet index (R13 read surface)."""
        return self.spark.read.parquet(self.index_path)

    def query(
        self,
        sentiment: str | None = None,
        hashtag: str | None = None,
        user: str | None = None,
    ) -> list[dict]:
        """R13 query-by-hashtag/sentiment/user over the index; bounded
        result page (the GET endpoint's backend)."""
        df = self.index()
        if sentiment:
            df = df.filter(F.col("sentiment") == sentiment)
        if hashtag:
            tag = hashtag if hashtag.startswith("#") else "#" + hashtag
            df = df.filter(F.array_contains("hashtags", tag.lower()))
        if user:
            df = df.filter(F.col("user_name") == user)
        rows = df.orderBy("tweet_id").limit(_QUERY_LIMIT).collect()
        return [
            {
                "tweet_id": r["tweet_id"],
                "user_name": r["user_name"],
                "sentiment": r["sentiment"],
                "hashtags": list(r["hashtags"]),
                "n_tokens": r["n_tokens"],
            }
            for r in rows
        ]
