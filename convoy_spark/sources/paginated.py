"""Custom Python DataSource for paginated-API ingestion (S2,
SURVEY §2.1 — the `fetch_conversation_tweets.py` surface).

The reference fetches conversation threads from a REST API: 26
conversation ids OR-packed per query (`fetch_conversation_tweets.py:52`),
500 tweets per page (`:74`), checkpoint after every page (`:78-85`).
Spark 4's Python DataSource API lets that protocol live INSIDE the
engine as a first-class source: each *query batch* becomes an input
partition, so a thousand executors fetch a thousand query batches
concurrently, and the landing-dir hop disappears.

The HTTP layer is deliberately pluggable-and-stubbed (no network in
this environment, and no external service dependencies in tests): the
default ``fetch_fn`` synthesizes deterministic pages. What is real is
the Spark integration — registration, schema declaration, partition
planning, per-partition iteration — i.e. everything a production
implementation keeps while swapping the fetch for `requests` +
retry/backoff (the reference's twarc decorators collapse into the
fetch function; task retry covers transient failures at the partition
level).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

QUERY_PACK = 26  # conversation ids OR-joined per API query
PAGE_SIZE = 500  # tweets per page (academic-track max)

PAGE_ROW_SCHEMA = StructType(
    [
        StructField("query_batch", IntegerType()),
        StructField("page_no", IntegerType()),
        StructField("conversation_id", LongType()),
        StructField("tweet_id", LongType()),
        StructField("text", StringType()),
    ]
)


def _default_fetch(conversation_id: int):
    """Deterministic stand-in for the API call: conversation c has
    (c mod 7) + 1 tweets. Replace with a real HTTP fetch in
    production."""
    n = conversation_id % 7 + 1
    for j in range(n):
        yield (conversation_id * 1000 + j, f"tweet {j} of conv {conversation_id}")


class _QueryBatch(InputPartition):
    def __init__(self, batch_no: int, conv_ids: list[int]):
        self.batch_no = batch_no
        self.conv_ids = conv_ids


class PaginatedReader(DataSourceReader):
    def __init__(self, options):
        self.n_conversations = int(options.get("n_conversations", 100))
        self.first_id = int(options.get("first_id", 1))

    def partitions(self):
        ids = list(
            range(self.first_id, self.first_id + self.n_conversations)
        )
        return [
            _QueryBatch(b, ids[i: i + QUERY_PACK])
            for b, i in enumerate(range(0, len(ids), QUERY_PACK))
        ]

    def read(self, partition: _QueryBatch):
        emitted = 0
        page_no = 0
        for conv in partition.conv_ids:
            for tweet_id, text in _default_fetch(conv):
                yield (partition.batch_no, page_no, conv, tweet_id, text)
                emitted += 1
                if emitted % PAGE_SIZE == 0:
                    page_no += 1  # page boundary — the checkpoint unit


class PaginatedAPISource(DataSource):
    """``spark.read.format("paginated_pages")`` after
    ``spark.dataSource.register(PaginatedAPISource)``."""

    @classmethod
    def name(cls) -> str:
        return "paginated_pages"

    def schema(self):
        return PAGE_ROW_SCHEMA

    def reader(self, schema):
        return PaginatedReader(self.options)
