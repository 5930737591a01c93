"""Observability — reference ``stats/`` (SURVEY.md §2.12, A6/A7).

The reference aggregates ``Stat{component, name, type, unit, value,
ts}`` into 60-second buckets with a 1-second late-arrival grace, then
reports count/sum/min/max/avg to statsd. The Spark-native shape:

  * per-operator counters → ``df.observe`` (free, no extra pass);
  * the stat stream itself → a windowed aggregation with a watermark
    (late stats dropped, exactly the reference's grace semantics);
  * reporting → a StreamingQueryListener that receives every
    micro-batch's observed metrics + source/sink progress and renders
    ``bifrost.<component>.<stat>.<unit>``-style lines
    (``stats/reporters/datadog/datadog.go:44-77`` naming).
"""

from __future__ import annotations

import json
import sys
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

BUCKET_SECONDS = 60  # aggregator.go:172
LATENESS_GRACE = "1 second"  # aggregator.go:44


def aggregate_stats(
    stats: DataFrame,
    ts_col: str = "ts",
    streaming: bool = False,
) -> DataFrame:
    """Stat rows (component, name, unit, value, ts) → 60 s buckets with
    the A6 aggregate set and A7 fan-out columns. With ``streaming=True``
    adds the 1 s watermark (late stats dropped, ``aggregator.go:278-285``)."""
    src = stats.withWatermark(ts_col, LATENESS_GRACE) if streaming else stats
    return (
        src.groupBy(
            F.window(ts_col, f"{BUCKET_SECONDS} seconds").alias("w"),
            "component",
            "name",
            "unit",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("total"),
            F.round(F.min("value"), 6).alias("vmin"),
            F.round(F.max("value"), 6).alias("vmax"),
            F.round(F.avg("value"), 6).alias("vavg"),
        )
        .select(F.col("w.start").alias("bucket_start"), "component", "name", "unit",
                "n", "total", "vmin", "vmax", "vavg")
    )


def observe_counts(df: DataFrame, observation_name: str, **named_exprs) -> DataFrame:
    """Attach observable metrics (evaluated during the pass, no extra
    job) — the analog of sprinkling stats.NewStatCount through the
    reference modules."""
    return df.observe(
        observation_name, *[expr.alias(name) for name, expr in named_exprs.items()]
    )


def statsd_reporter(host: str = "127.0.0.1", port: int = 8125, prefix: str = "bifrost"):
    """Datadog/statsd reporter factory (``stats/reporters/datadog/
    datadog.go:44-77``): returns an emit callback for
    StdoutStatsListener that pushes ``bifrost.<component>.<stat>``
    counters over UDP statsd wire format. No statsd client library
    needed — the wire format is one line per metric."""
    import socket

    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    def emit(line: str) -> None:
        stat = json.loads(line)
        base = stat.get("name", f"{prefix}.stream.progress")
        payloads = [f"{base}.rows:{stat.get('rows', 0)}|c"]
        for obs_name, metrics in (stat.get("observed") or {}).items():
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    payloads.append(f"{prefix}.{obs_name}.{k}:{v}|g")
        sock.sendto("\n".join(payloads).encode(), (host, port))

    return emit


class StdoutStatsListener(StreamingQueryListener):
    """Renders per-micro-batch progress + observed metrics as one JSON
    line each, statsd-ish names: bifrost.<component>.<name>."""

    def __init__(self, emit: Callable[[str], None] | None = None, component: str = "stream"):
        self.emit = emit or (lambda s: print(s, file=sys.stderr))
        self.component = component
        self.seen: list[dict] = []

    def onQueryStarted(self, event) -> None:  # pragma: no cover - trivial
        pass

    def onQueryProgress(self, event) -> None:
        p = event.progress
        stat = {
            "name": f"bifrost.{self.component}.progress",
            "batch_id": p.batchId,
            "rows": p.numInputRows,
            "observed": {k: dict(v) for k, v in (p.observedMetrics or {}).items()},
        }
        self.seen.append(stat)
        self.emit(json.dumps(stat, default=str))

    def onQueryTerminated(self, event) -> None:  # pragma: no cover - trivial
        pass

    def onQueryIdle(self, event) -> None:  # pragma: no cover - trivial
        pass
