"""Layered config surface — parity with the reference's CLI/env/YAML
precedence (``main/main.go:561-567``): CLI flag > environment
variable > YAML config file > flag default. ``from_env`` remains the
env-only fast path; ``resolve`` applies the full chain.

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


# every config key, its type, and its default — single source of truth
# for all three layers (CLI dest / env var / YAML key are the same name
# modulo case)
_KEYS: dict[str, tuple[type, object]] = {
    "WHITELIST": (list, []),
    "BLACKLIST": (list, []),
    "WHITELIST_REGEX": (bool, False),
    "BLACKLIST_REGEX": (bool, False),
    "PARTITION_METHOD": (str, "none"),
    "PARTITION_COUNT": (int, 1),
    "NO_MARSHAL_OLD_VALUE": (bool, False),
    "WORKERS": (int, 1),
    "BATCHER_ROUTING_METHOD": (str, "round-robin"),
    "CLIENT_BUFFER_SIZE": (int, 10_000),
}


def _coerce(key: str, raw, typ: type):
    """Normalize a raw layer value (string from env/CLI, native from
    YAML) to the key's type."""
    if raw is None:
        return None
    if typ is list:
        return list(raw) if isinstance(raw, (list, tuple)) else _split(str(raw))
    if typ is bool:
        return raw if isinstance(raw, bool) else str(raw).lower() in _TRUE
    return typ(raw)


def _load_yaml(path: str) -> dict:
    """YAML config layer (reference: ``altsrc.NewYamlSourceFromFlagFunc``,
    main.go:566). Keys are the reference's flag names (lower-kebab or
    lower_snake) or our env names — all normalized to env-name form."""
    import yaml  # stdlib-adjacent; present in this environment

    with open(path) as f:
        doc = yaml.safe_load(f) or {}
    if not isinstance(doc, dict):
        raise ValueError(f"config file {path!r} must be a mapping")
    return {str(k).replace("-", "_").upper(): v for k, v in doc.items()}


def _build(get) -> RuntimeConfig:
    pipeline = PipelineConfig(
        whitelist=get("WHITELIST"),
        blacklist=get("BLACKLIST"),
        whitelist_regex=get("WHITELIST_REGEX"),
        blacklist_regex=get("BLACKLIST_REGEX"),
        partition_method=get("PARTITION_METHOD"),
        partition_buckets=get("PARTITION_COUNT"),
        no_marshal_old_value=get("NO_MARSHAL_OLD_VALUE"),
    )
    if pipeline.whitelist and pipeline.blacklist:
        raise ValueError("WHITELIST and BLACKLIST are mutually exclusive")
    routing = get("BATCHER_ROUTING_METHOD")
    if routing not in ("round-robin", "partition"):
        raise ValueError(f"unknown BATCHER_ROUTING_METHOD {routing!r}")
    return RuntimeConfig(
        pipeline=pipeline,
        workers=get("WORKERS"),
        routing_method=routing,
        client_buffer_size=get("CLIENT_BUFFER_SIZE"),
    )


def resolve(
    cli: dict | None = None,
    env: dict | None = None,
    config_file: str | None = None,
) -> RuntimeConfig:
    """Full precedence chain (main.go:561-567): CLI > env > YAML >
    default. ``cli`` maps env-style key names to values (None = flag
    not given); ``config_file`` is an optional YAML path."""
    cli = cli or {}
    env = dict(os.environ) if env is None else env
    yaml_layer = _load_yaml(config_file) if config_file else {}

    def get(key: str):
        typ, default = _KEYS[key]
        for layer in (cli, env, yaml_layer):
            v = _coerce(key, layer.get(key), typ)
            if v is not None:
                return v
        return default

    return _build(get)


def from_env(env: dict | None = None) -> RuntimeConfig:
    """Env-only fast path (back-compat)."""
    return resolve(cli={}, env=env, config_file=None)
