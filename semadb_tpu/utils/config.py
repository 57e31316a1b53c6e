"""Config loading: YAML file via SEMADB_CONFIG env.

Parity reference: config/config.go — ``SEMADB_CONFIG`` env names a YAML
file decoded into {debug, clusterNode, httpApi}; example files mirror
config/singleServer.yaml.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import yaml

from semadb_tpu.cluster.node import ClusterNodeConfig
from semadb_tpu.httpapi.server import HttpApiConfig


@dataclass
class ConfigMap:
    debug: bool = False
    pretty_log_output: bool = False
    cluster_node: ClusterNodeConfig = field(default_factory=ClusterNodeConfig)
    http_api: HttpApiConfig = field(default_factory=HttpApiConfig)

    @classmethod
    def from_dict(cls, d: dict) -> "ConfigMap":
        http = HttpApiConfig.from_dict(d.get("httpApi") or {})
        http.debug = bool(d.get("debug", False))
        return cls(
            debug=bool(d.get("debug", False)),
            pretty_log_output=bool(d.get("prettyLogOutput", False)),
            cluster_node=ClusterNodeConfig.from_dict(d.get("clusterNode") or {}),
            http_api=http,
        )


def load_config(path: str = "") -> ConfigMap:
    """config.LoadConfig parity: path argument falls back to SEMADB_CONFIG."""
    path = path or os.environ.get("SEMADB_CONFIG", "")
    if not path:
        raise ValueError("no config path given and SEMADB_CONFIG not set")
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return ConfigMap.from_dict(raw)
