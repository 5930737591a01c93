"""Property-based check of the span reader's one-pass-per-file sweep:
for ANY file layout and ANY span list (overlapping ranges excluded —
the planner never produces them; out-of-order, cross-file, empty, and
past-EOF spans included), `_read_span_msgs` must equal the obvious
open-per-span reference implementation."""

from __future__ import annotations

import json
import os

from hypothesis import given, settings
from hypothesis import strategies as st

from pg_bifrost_spark.sources.pgcdc import _read_span_msgs


def _naive(wal_dir: str, spans: list):
    out = []
    for name, a, b in spans:
        with open(os.path.join(wal_dir, name)) as f:
            for lineno, raw in enumerate(f):
                if a <= lineno < b and raw.strip():
                    m = json.loads(raw)
                    out.append(
                        (
                            m["wal_start"],
                            m.get("server_time_ms", 0),
                            None if "error" in m else m["line"],
                        )
                    )
    return out


@st.composite
def corpus_and_spans(draw):
    n_files = draw(st.integers(1, 3))
    files = {}
    for i in range(n_files):
        n_lines = draw(st.integers(0, 12))
        lines = []
        for j in range(n_lines):
            kind = draw(st.integers(0, 3))
            if kind == 0:
                lines.append("")  # blank line (skipped, but numbered)
            elif kind == 1:
                lines.append(json.dumps({"wal_start": draw(st.integers(0, 99)), "error": "x"}))
            else:
                lines.append(
                    json.dumps(
                        {
                            "wal_start": draw(st.integers(0, 99)),
                            "server_time_ms": draw(st.integers(0, 9)),
                            "line": draw(st.text(alphabet="abc B", max_size=8)),
                        }
                    )
                )
        files[f"f{i}.jsonl"] = lines
    n_spans = draw(st.integers(0, 8))
    spans = []
    for _ in range(n_spans):
        name = draw(st.sampled_from(sorted(files)))
        a = draw(st.integers(0, 14))
        b = draw(st.integers(a, 15))
        spans.append((name, a, b))
    # the planner emits disjoint spans per file; drop overlaps, keep order
    seen: dict[str, list] = {}
    ok = []
    for name, a, b in spans:
        if all(b <= x or a >= y for x, y in seen.get(name, [])):
            seen.setdefault(name, []).append((a, b))
            ok.append((name, a, b))
    return files, ok


@settings(max_examples=200, deadline=None)
@given(corpus_and_spans())
def test_span_reader_matches_naive(tmp_path_factory, data):
    files, spans = data
    wal_dir = str(tmp_path_factory.mktemp("span_fuzz"))
    for name, lines in files.items():
        with open(os.path.join(wal_dir, name), "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
    assert _read_span_msgs(wal_dir, spans) == _naive(wal_dir, spans)
