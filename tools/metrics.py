"""Stage-metric deltas via the Spark status REST API.

The benches that argue about SCALE (probe bytes flat vs index size,
grid-vs-salted exchange volume) need byte counters, not just seconds
— wall-clock on a noisy shared host has 3-20× variance, but
bytes-read / shuffle-bytes-written are deterministic properties of
the plan (VERDICT r4 item 4). The status REST endpoint exposes the
per-stage aggregates of every completed stage; diffing two snapshots
around a workload gives its exact byte footprint.

Requires ``spark.ui.enabled=true`` on the session (the engine default
is false; benches opt in via ``extra_conf``). Local use only — it
polls ``localhost:<spark.ui.port>``.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

#: Stage counters summed per snapshot.
FIELDS = (
    "inputBytes",
    "outputBytes",
    "shuffleReadBytes",
    "shuffleWriteBytes",
)


class StageMetrics:
    """Snapshot/diff of completed-stage byte counters.

    >>> sm = StageMetrics(spark)
    >>> sm.snapshot()
    >>> run_workload()
    >>> d = sm.delta()   # {"inputBytes": ..., "shuffleWriteBytes": ...}
    """

    def __init__(self, spark):
        self._spark = spark
        port = spark.conf.get("spark.ui.port", "4040")
        app = spark.sparkContext.applicationId
        self._url = (
            f"http://localhost:{port}/api/v1/applications/{app}/stages"
            "?status=complete"
        )
        self._base = {f: 0 for f in FIELDS}

    def _read(self) -> dict[str, int]:
        # completed-stage records land in the status store a beat
        # after the job returns; settle-poll until two reads agree
        prev = None
        for _ in range(20):
            try:
                with urllib.request.urlopen(self._url, timeout=10) as r:
                    stages = json.load(r)
            except (urllib.error.URLError, OSError):
                time.sleep(0.25)
                continue
            cur = {
                f: sum(s.get(f, 0) for s in stages) for f in FIELDS
            }
            if cur == prev:
                return cur
            prev = cur
            time.sleep(0.25)
        return prev or {f: 0 for f in FIELDS}

    def snapshot(self) -> None:
        self._base = self._read()

    def delta(self) -> dict[str, int]:
        cur = self._read()
        return {f: cur[f] - self._base[f] for f in FIELDS}
