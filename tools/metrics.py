"""Stage-metric deltas via the Spark status REST API.

The benches that argue about SCALE (probe bytes flat vs index size,
grid-vs-salted exchange volume) need byte counters, not just seconds
— wall-clock on a noisy shared host has 3-20× variance, but
bytes-read / shuffle-bytes-written are deterministic properties of
the plan (VERDICT r4 item 4). The status REST endpoint exposes the
per-stage aggregates of every completed stage; summing the stages
whose stageId is ABOVE a snapshot's high-water mark gives a
workload's exact byte footprint.

High-water-mark design (not totals-diffing) for two reasons found in
review: (a) the status store evicts old stages past
``spark.ui.retainedStages`` (default 1000), so a totals diff goes
negative/garbage late in a long bench; summing only NEW stage ids is
immune because evicted stages are all OLD. (b) completed-stage
records land in the store asynchronously — "two equal reads" cannot
distinguish "updated and stable" from "not updated yet"; waiting for
at least one stage id above the mark is an unambiguous signal the
workload's records arrived.

Requires ``spark.ui.enabled=true`` on the session (the engine default
is false; benches opt in via ``extra_conf``). The endpoint comes from
``sc.uiWebUrl`` — the port Spark actually bound, not an assumed 4040
(a second local app shifts to 4041+ via spark.port.maxRetries).
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
        ui = spark.sparkContext.uiWebUrl  # actual scheme://host:port
        app = spark.sparkContext.applicationId
        self._url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
        self._hwm = -1
        self._snapshot_ok = False  # did snapshot() reach a stable mark?

    def _stages(self) -> list[dict] | None:
        try:
            with urllib.request.urlopen(self._url, timeout=10) as r:
                return json.load(r)
        except (urllib.error.URLError, OSError):
            return None

    def snapshot(self) -> None:
        """Record the high-water stage id — AFTER the async store has
        settled. A stage that finished just before snapshot() may not
        have landed yet; recording the mark too early would credit
        its bytes to the measured workload, so poll until the max
        stage id is stable across two reads before recording it."""
        hwm, stable, ok = -1, 0, False
        for _ in range(40):
            stages = self._stages()
            if stages is not None:
                cur = max(
                    (s.get("stageId", -1) for s in stages), default=-1
                )
                if cur == hwm:
                    stable += 1
                    if stable >= 2:
                        ok = True
                        break
                else:
                    hwm, stable = cur, 0
            time.sleep(0.25)
        self._hwm = hwm
        # hwm == -1 with a RESPONSIVE endpoint (fresh app, zero completed
        # stages) is a valid mark; an unresponsive endpoint is not —
        # delta() must then report the sample as invalid, not attribute
        # all of history to the workload (ADVICE r5 item 4)
        self._snapshot_ok = ok

    def delta(self) -> dict[str, int] | None:
        """Byte counters of every stage completed since snapshot(),
        or ``None`` when no trustworthy reading exists — the caller
        must record the sample as INVALID, never as a number (ADVICE
        r5 item 4: the old zero/`prev` fallbacks silently wrote 0.0 MB
        or all-of-history totals into "deterministic" scale benches).

        ``None`` cases: snapshot() never obtained a stable high-water
        mark (an unresponsive endpoint leaves hwm == -1, which would
        attribute every historical stage to the workload), or the
        status endpoint never served a stable post-snapshot sum
        inside the poll window. A stable hwm of -1 on a FRESH app
        (zero completed stages, responsive endpoint) stays valid.

        Otherwise: waits (up to ~15 s) for at least one post-snapshot
        stage to land in the async status store — a workload that ran
        any job always completes ≥ 1 stage, so 'no new stages' means
        'not published yet', never 'done' — then requires the
        post-snapshot sums to hold stable across THREE consecutive
        polls (a 0.75 s quiet period): one stage arriving does not
        mean all of a multi-job workload's stages arrived, and a
        longer quiet bar shrinks (without fully closing — the store
        gives no flushed-everything signal) the window for a
        straggler stage record to be missed."""
        if not self._snapshot_ok:  # snapshot timed out / never called
            return None
        prev, stable = None, 0
        for _ in range(60):
            stages = self._stages()
            if stages is not None:
                new = [s for s in stages if s.get("stageId", -1) > self._hwm]
                if new:
                    cur = {
                        f: sum(s.get(f, 0) for s in new) for f in FIELDS
                    }
                    if cur == prev:
                        stable += 1
                        if stable >= 2:  # 3 equal reads total
                            return cur
                    else:
                        prev, stable = cur, 0
            time.sleep(0.25)
        return None  # never reached a stable reading — sample invalid
