"""`ray job submit` entry point — the north rule's deployment surface.

On a real cluster:

    ray job submit --working-dir . -- \\
        python -m core_ray.cli stream-agg --input-dir /data/tokens \\
            --out-dir /data/out --window-s 60 --num-partitions 64

The job server sets RAY_ADDRESS; ``_ensure_ray()`` connects to the running
cluster (or starts a local one when invoked standalone).  Each subcommand
drives one of the streaming jobs end to end and prints ONE JSON result line
(epochs, rows, late counts) so the submitting harness can assert on it.
Re-submitting the same job with --resume skips committed epochs — the
exactly-once sink makes the re-run byte-identical, which is the crash/retry
contract `ray job submit` needs.

Subcommands: stream-agg (tumbling/sliding/session windowed aggregate over
the pre-tokenized sequence table), stream-join (two-stream symmetric hash
join), stream-pattern (CEP sequence matching), query (any `__ray_entry__`
driver query by name, written to --out-dir as parquet).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray() -> None:
    import ray

    if not ray.is_initialized():
        # inside `ray job submit`, RAY_ADDRESS points at the cluster; when
        # run standalone this starts a local session
        ray.init(ignore_reinit_error=True, logging_level="ERROR")


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--out-dir", required=True)
    p.add_argument("--num-partitions", type=int, default=8)
    p.add_argument("--lateness-s", type=int, default=2)
    p.add_argument("--files-per-epoch", type=int, default=1)
    p.add_argument("--resume", action="store_true")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="core_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sa = sub.add_parser("stream-agg", help="windowed aggregate over the token stream")
    sa.add_argument("--input-dir", required=True)
    sa.add_argument("--window-kind", choices=["tumbling", "sliding", "session"],
                    default="tumbling")
    sa.add_argument("--window-s", type=int, default=60)
    sa.add_argument("--slide-s", type=int, default=30)
    sa.add_argument("--gap-s", type=int, default=300)
    sa.add_argument("--token-stats", action="store_true")
    sa.add_argument("--output-mode", choices=["append", "update"],
                    default="append")
    _add_common(sa)

    sj = sub.add_parser("stream-join", help="stream-stream symmetric hash join")
    sj.add_argument("--left-dir", required=True)
    sj.add_argument("--right-dir", required=True)
    sj.add_argument("--key-col", default="key")
    sj.add_argument("--ts-col", default="ts_us")
    sj.add_argument("--band-lo-us", type=int, default=0)
    sj.add_argument("--band-hi-us", type=int, default=600_000_000)
    sj.add_argument("--left-payload", default="")
    sj.add_argument("--right-payload", default="")
    sj.add_argument("--how", choices=["inner", "left_outer", "full_outer", "asof"],
                    default="inner")
    _add_common(sj)

    sp = sub.add_parser("stream-pattern", help="streaming CEP sequence matching")
    sp.add_argument("--input-dir", required=True)
    sp.add_argument("--pattern", required=True, help="comma-separated step types")
    sp.add_argument("--within-us", type=int, required=True)
    sp.add_argument("--key-col", default="key")
    sp.add_argument("--ts-col", default="ts_us")
    sp.add_argument("--type-col", default="etype")
    sp.add_argument("--tiebreak-col", default="event_id")
    _add_common(sp)

    q = sub.add_parser("query", help="run a driver query, write parquet")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--out-dir", required=True)

    pl = sub.add_parser(
        "pipeline", help="run a reference-format pipeline-job JSON spec"
    )
    pl.add_argument("spec", help="path to the pipeline JSON")

    rs = sub.add_parser(
        "rescale", help="re-route a stopped job's checkpoint to a new partition count"
    )
    rs.add_argument("--out-dir", required=True)
    rs.add_argument("--num-partitions", type=int, required=True)
    return ap


def main(argv: list[str] | None = None) -> dict:
    args = build_parser().parse_args(argv)
    _ensure_ray()
    if args.cmd == "stream-agg":
        from .streaming import StreamConfig, StreamingJob

        cfg = StreamConfig(
            input_dir=args.input_dir,
            out_dir=args.out_dir,
            num_partitions=args.num_partitions,
            window_s=args.window_s,
            lateness_s=args.lateness_s,
            files_per_epoch=args.files_per_epoch,
            window_kind=args.window_kind,
            slide_s=args.slide_s,
            gap_s=args.gap_s,
            token_stats=args.token_stats,
            output_mode=args.output_mode,
        )
        res = StreamingJob(cfg).run(resume=args.resume)
    elif args.cmd == "stream-join":
        from .streaming import JoinConfig, StreamJoinJob

        cfg = JoinConfig(
            left_dir=args.left_dir,
            right_dir=args.right_dir,
            out_dir=args.out_dir,
            key_col=args.key_col,
            ts_col=args.ts_col,
            band_lo_us=args.band_lo_us,
            band_hi_us=args.band_hi_us,
            num_partitions=args.num_partitions,
            lateness_s=args.lateness_s,
            files_per_epoch=args.files_per_epoch,
            left_payload=[c for c in args.left_payload.split(",") if c],
            right_payload=[c for c in args.right_payload.split(",") if c],
            how=args.how,
        )
        res = StreamJoinJob(cfg).run(resume=args.resume)
    elif args.cmd == "stream-pattern":
        from .streaming import PatternConfig, StreamPatternJob

        cfg = PatternConfig(
            in_dir=args.input_dir,
            out_dir=args.out_dir,
            pattern=args.pattern.split(","),
            within_us=args.within_us,
            key_col=args.key_col,
            ts_col=args.ts_col,
            type_col=args.type_col,
            tiebreak_col=args.tiebreak_col,
            num_partitions=args.num_partitions,
            lateness_s=args.lateness_s,
            files_per_epoch=args.files_per_epoch,
        )
        res = StreamPatternJob(cfg).run(resume=args.resume)
    elif args.cmd == "rescale":
        # offline: no Ray session needed, but _ensure_ray is harmless
        from .streaming import rescale_checkpoint

        res = rescale_checkpoint(args.out_dir, args.num_partitions)
    elif args.cmd == "pipeline":
        from .pipelines.converters import PipelineJobFromJsonConverter

        from .pipelines.framework import PipelineJobExecute

        with open(args.spec) as f:
            job = PipelineJobFromJsonConverter(f.read()).convert()
        results = PipelineJobExecute(job).run()
        res = {"name": job.name, "steps": sorted(results), "ok": True}
    else:  # query
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "__ray_entry__", os.path.join(os.path.dirname(__file__), "..",
                                          "__ray_entry__.py")
        )
        entry = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(entry)
        ds = entry.queries()[args.name](args.sf_dir)
        import ray.data

        if not isinstance(ds, ray.data.Dataset):
            import pandas as pd
            import pyarrow as pa

            if isinstance(ds, pd.DataFrame):
                ds = ray.data.from_pandas(ds)
            elif isinstance(ds, pa.Table):
                ds = ray.data.from_arrow(ds)
        ds = ds.materialize()  # one execution for both count and write
        ds.write_parquet(args.out_dir)
        res = {"rows": ds.count(), "out_dir": args.out_dir}
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    main(sys.argv[1:])
