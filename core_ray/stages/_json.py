"""JSON parse kernel for the wire-format hot paths.

``loads`` resolves to orjson (a Rust parser, ~5-10x stdlib on small
messages) when importable, stdlib ``json`` otherwise — parsing has no
output-format dependency so the swap is semantics-free.  SERIALIZATION
sites deliberately keep stdlib ``json.dumps``: its ``", "``/``": "``
separators are part of oracled output strings (e.g. the eventhub decode
properties columns), and orjson's compact form would change bytes.
"""

try:
    import orjson as _orjson

    def loads(s):
        return _orjson.loads(s)

except ImportError:  # pragma: no cover - orjson present in this image
    import json as _json

    def loads(s):
        return _json.loads(s)


__all__ = ["loads"]
