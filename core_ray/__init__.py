"""core_ray — a from-scratch Ray-Data-native engine with the query and
data-processing capabilities of rtdip/core (reference at /root/reference,
studied via SURVEY.md; no code ported).

Layout:
    schema.py     Arrow schema definitions (tokens table, PCDM events, latest, metadata)
    synth.py      deterministic synthetic tokens-table generator (FIXTURES.md F1)
    windows.py    tumbling/sliding/session window assignment (start-aligned offsets)
    ops/          time-series query operators (raw, resample, interpolate, twa, ...)
    stages/       stateless map_batches transforms + parsers (JSON -> PCDM, ...)
    sources/      readers
    functions/    training-data ops: dedup, similarity search, text analysis
    dq/           data-quality manipulation + monitoring operators
    state/        keyed state stores, watermark tracker
    streaming/    epoch-driven streaming engine: source, window actors, sink, checkpoint
    pipelines/    Pipeline composition API
"""

__version__ = "0.1.0"
