"""JSON parse kernel for the wire-format hot paths.

``loads`` resolves to orjson (a Rust parser, ~5-10x stdlib on small
messages) when importable, with a per-message stdlib fallback for the
inputs orjson rejects but stdlib accepts (``NaN``/``Infinity`` literals and
>64-bit integers — industrial sensor producers do emit NaN), so the swap is
behavior-preserving: anything that parsed before still parses, and invalid
JSON raises ``json.JSONDecodeError`` from the stdlib retry exactly as
before.  SERIALIZATION sites deliberately keep stdlib ``json.dumps``: its
``", "``/``": "`` separators are part of oracled output strings (e.g. the
eventhub decode properties columns), and orjson's compact form would change
bytes.
"""

import json as _json

try:
    import orjson as _orjson

    def loads(s):
        try:
            return _orjson.loads(s)
        except _orjson.JSONDecodeError:
            # NaN/Infinity/big-int messages (or truly invalid JSON, which
            # re-raises stdlib JSONDecodeError like the old path)
            return _json.loads(s)

except ImportError:  # pragma: no cover - orjson present in this image

    def loads(s):
        return _json.loads(s)


__all__ = ["loads"]
