"""Native session_window streaming sessionization + statsd wire format."""

from __future__ import annotations

import json
import socket

from pg_bifrost_spark.streaming.analytics import session_windows, stream_events
from pg_bifrost_spark.streaming.stats import statsd_reporter

SF = "/root/testdata/sf0.001"


def test_streaming_session_window_counts(spark):
    ev = stream_events(spark, SF)
    q = (
        session_windows(ev, gap="5 minutes")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_win")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from sess_win").collect()
    assert rows
    # every event is in exactly one session
    assert sum(r.n_events for r in rows) == 1000
    # session bounds are consistent (end - start >= 0; gap merges hold)
    assert all(r.session_end >= r.session_start for r in rows)
    # batch twin agreement on the total number of (user, session) groups
    from pg_bifrost_spark.plans import QUERIES, load_all

    load_all()
    batch_sessions = QUERIES["sessionize_users"](spark, SF).count()
    assert len(rows) == batch_sessions


def test_statsd_reporter_wire_format():
    srv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    srv.bind(("127.0.0.1", 0))
    srv.settimeout(5)
    port = srv.getsockname()[1]
    emit = statsd_reporter(port=port)
    emit(json.dumps({"name": "bifrost.stream.progress", "rows": 42,
                     "observed": {"cdc_parse_ab": {"invalid_msgs": 3}}}))
    data = srv.recv(4096).decode()
    assert "bifrost.stream.progress.rows:42|c" in data
    assert "bifrost.cdc_parse_ab.invalid_msgs:3|g" in data
