"""S1: HTTP poll source (SURVEY.md §2.1) -- the Confluent HTTP Source
connector's behavior (poll a REST endpoint on an interval, append response
records, SIMPLE_INCREMENTING offsets -- README.md:60-82,
docs/kafka-connector-configurations.md:8-56) re-expressed for Spark.

Structured Streaming has no built-in HTTP source, and a custom
DataSourceV2 stream would put a slow, rate-limited network call inside
executor tasks -- the wrong place for it (retries multiply the polling,
and 1000 executors hammering one REST endpoint is an outage, not a
design). The connector-shaped answer is a DRIVER-SIDE poller that lands
each poll as a JSON batch file in a directory the engine already watches
(`streaming/pipeline.file_order_stream`); Spark's file source then gives
exactly-once ingestion of each landed batch via the checkpoint, and the
cluster never sees the network.

The poller takes `fetch: () -> list[dict]` instead of a URL so tests (and
air-gapped runs) inject a fake; `http_fetcher(url)` builds the real one
from urllib when a live endpoint exists. Offset semantics mirror
SIMPLE_INCREMENTING: the persisted offset advances by the record count of
each poll, and re-polling an unchanged collection re-lands only records
past the offset (the connector's `http.initial.offset` behavior).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional


def http_fetcher(url: str, timeout: float = 10.0) -> Callable[[], list]:
    """Real fetcher for a json-server-style collection endpoint; returns
    the `orders` array of the response object (S4's shape)."""

    def fetch() -> list:
        import urllib.request

        with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
            body = json.loads(resp.read().decode("utf-8"))
        return body["orders"] if isinstance(body, dict) else body

    return fetch


class HttpPollSource:
    """Poll -> land JSON batch files with SIMPLE_INCREMENTING offsets."""

    def __init__(self, fetch: Callable[[], list], landing_dir: str):
        self.fetch = fetch
        self.landing_dir = landing_dir
        self._offset_path = os.path.join(landing_dir, "_http_offset")
        os.makedirs(landing_dir, exist_ok=True)

    @property
    def offset(self) -> int:
        try:
            with open(self._offset_path) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def poll_once(self) -> int:
        """One poll: land records past the current offset as ONE batch
        file (atomic rename, so the file stream never reads a partial
        write); returns the number of new records landed."""
        records = self.fetch()
        start = self.offset
        fresh = records[start:]
        if not fresh:
            return 0
        batch = os.path.join(self.landing_dir, f"batch_{start:012d}.json")
        tmp = batch + ".tmp"
        with open(tmp, "w") as f:
            for r in fresh:
                f.write(json.dumps(r) + "\n")
        os.rename(tmp, batch)
        with open(self._offset_path, "w") as f:
            f.write(str(start + len(fresh)))
        return len(fresh)

    def run(
        self,
        interval_s: float,
        max_polls: Optional[int] = None,
        sleep: Callable[[float], None] = time.sleep,
    ) -> int:
        """The connector loop (request.interval.ms analog). Returns total
        records landed; bounded by max_polls for tests/demos."""
        total, polls = 0, 0
        while max_polls is None or polls < max_polls:
            total += self.poll_once()
            polls += 1
            if max_polls is None or polls < max_polls:
                sleep(interval_s)
        return total
