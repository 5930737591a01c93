"""Environment-variable config surface — parity with the reference's
CLI/env/YAML flags (``main/main.go:557-763``; precedence CLI > env in
the reference, env-only here since Spark apps configure via env/spark
conf).

| env var                  | reference flag            | default |
|--------------------------|---------------------------|---------|
| WHITELIST                | --whitelist               | (none)  |
| BLACKLIST                | --blacklist               | (none)  |
| WHITELIST_REGEX          | --whitelist-regex         | false   |
| BLACKLIST_REGEX          | --blacklist-regex         | false   |
| PARTITION_METHOD         | --partition-method        | none    |
| PARTITION_COUNT          | --partition-count         | 1       |
| NO_MARSHAL_OLD_VALUE     | --no-marshal-old-value    | false   |
| WORKERS                  | --workers                 | 1       |
| BATCHER_ROUTING_METHOD   | --batcher-routing-method  | round-robin |
| CLIENT_BUFFER_SIZE       | --client-buffer-size      | 10000   |

The reference's whitelist/blacklist mutual-exclusion check had a bug
(required all four flags set, ``main/main.go:437``); we implement the
documented intent: either list alone, never both.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from .cdc.pipeline import PipelineConfig

_TRUE = {"1", "true", "yes", "on"}


def _split(v: str | None) -> list[str]:
    return [s.strip() for s in v.split(",") if s.strip()] if v else []


def _bool(name: str, env: dict) -> bool:
    return env.get(name, "").lower() in _TRUE


@dataclass
class RuntimeConfig:
    pipeline: PipelineConfig
    workers: int = 1
    routing_method: str = "round-robin"  # or "partition" (strict order)
    client_buffer_size: int = 10_000  # → source max_msgs_per_batch


def from_env(env: dict | None = None) -> RuntimeConfig:
    env = dict(os.environ) if env is None else env
    pipeline = PipelineConfig(
        whitelist=_split(env.get("WHITELIST")),
        blacklist=_split(env.get("BLACKLIST")),
        whitelist_regex=_bool("WHITELIST_REGEX", env),
        blacklist_regex=_bool("BLACKLIST_REGEX", env),
        partition_method=env.get("PARTITION_METHOD", "none"),
        partition_buckets=int(env.get("PARTITION_COUNT", "1")),
        no_marshal_old_value=_bool("NO_MARSHAL_OLD_VALUE", env),
    )
    if pipeline.whitelist and pipeline.blacklist:
        raise ValueError("WHITELIST and BLACKLIST are mutually exclusive")
    routing = env.get("BATCHER_ROUTING_METHOD", "round-robin")
    if routing not in ("round-robin", "partition"):
        raise ValueError(f"unknown BATCHER_ROUTING_METHOD {routing!r}")
    return RuntimeConfig(
        pipeline=pipeline,
        workers=int(env.get("WORKERS", "1")),
        routing_method=routing,
        client_buffer_size=int(env.get("CLIENT_BUFFER_SIZE", "10000")),
    )
