"""HTTP REST API (v1 legacy vector API + v2 multi-index API)."""

from semadb_tpu.httpapi.server import (  # noqa: F401
    HttpApiConfig,
    HttpServer,
    run_http_server,
)
