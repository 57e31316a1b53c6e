"""HTTP body encoding/decoding: JSON and msgpack by content type.

Parity reference: httpapi/utils/encdec.go (Encode/DecodeValid with JSON +
msgpack content negotiation).
"""

from __future__ import annotations

import json
from typing import Any, Tuple

import msgpack

CONTENT_JSON = "application/json"
CONTENT_MSGPACK = "application/msgpack"


def decode_body(content_type: str, body: bytes) -> Any:
    if CONTENT_MSGPACK in (content_type or ""):
        return msgpack.unpackb(body, raw=False, strict_map_key=False)
    return json.loads(body.decode("utf-8")) if body else {}


def encode_body(accept: str, obj: Any) -> Tuple[str, bytes]:
    if CONTENT_MSGPACK in (accept or ""):
        return CONTENT_MSGPACK, msgpack.packb(obj, use_bin_type=True)
    return CONTENT_JSON, json.dumps(obj).encode("utf-8")
