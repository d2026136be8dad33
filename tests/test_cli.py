"""The `ray job submit` CLI surface: each subcommand drives its job end to
end inside the session Ray (the _ensure_ray guard skips init)."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from core_ray.cli import main


def test_cli_stream_agg_and_resume(tmp_path):
    from core_ray.synth import write_tokens_table

    ind, out = str(tmp_path / "in"), str(tmp_path / "out")
    write_tokens_table(ind, n_rows=4000, rows_per_file=1000)
    res = main(
        [
            "stream-agg", "--input-dir", ind, "--out-dir", out,
            "--window-s", "60", "--num-partitions", "4",
        ]
    )
    assert res["totals"]["rows"] > 0
    # re-submission resumes: all epochs already committed, nothing re-emitted
    res2 = main(
        [
            "stream-agg", "--input-dir", ind, "--out-dir", out,
            "--window-s", "60", "--num-partitions", "4", "--resume",
        ]
    )
    assert res2["totals"]["rows"] == 0


def test_cli_stream_pattern(tmp_path):
    df = pd.DataFrame(
        {
            "key": np.array([1, 1, 1], dtype="int64"),
            "ts_us": np.array([1_000_000, 2_000_000, 3_000_000], dtype="int64"),
            "etype": ["A", "B", "C"],
            "event_id": np.arange(3, dtype="int64"),
        }
    )
    ind, out = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(ind)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), f"{ind}/f0.parquet")
    res = main(
        [
            "stream-pattern", "--input-dir", ind, "--out-dir", out,
            "--pattern", "A,B,C", "--within-us", "600000000",
            "--num-partitions", "2", "--lateness-s", "3600",
        ]
    )
    assert res["totals"]["rows"] == 1


def test_cli_query_writes_parquet(tmp_path):
    out = str(tmp_path / "q")
    res = main(["query", "ts_metadata", "--out-dir", out])
    assert res["rows"] > 0
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert files and sum(pq.read_table(f).num_rows for f in files) == res["rows"]


def test_cli_emits_json_line(tmp_path, capsys):
    out = str(tmp_path / "q2")
    main(["query", "ts_metadata", "--out-dir", out])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line)["rows"] > 0


def test_cli_pipeline_spec(tmp_path):
    spec = {
        "name": "clean-count",
        "description": "token counts over the docs table",
        "task_list": [
            {
                "name": "t1",
                "step_list": [
                    {
                        "name": "src",
                        "component": "ParquetSource",
                        "component_parameters": {
                            "path": "/root/testdata/sf0.001/documents.parquet",
                            "columns": ["doc_id", "text"],
                        },
                    },
                    {
                        "name": "counts",
                        "component": "FunctionTransformer",
                        "component_parameters": {"fn": "token_count"},
                        "depends_on_step": ["src"],
                    },
                    {
                        "name": "sink",
                        "component": "ParquetDestination",
                        "component_parameters": {"path": str(tmp_path / "out")},
                        "depends_on_step": ["counts"],
                    },
                ],
            }
        ],
    }
    sp = tmp_path / "spec.json"
    sp.write_text(json.dumps(spec))
    res = main(["pipeline", str(sp)])
    assert res["ok"] and res["steps"] == ["counts", "sink", "src"]
    files = glob.glob(str(tmp_path / "out" / "*.parquet"))
    assert files and sum(pq.read_table(f).num_rows for f in files) == 500


def test_cli_rescale_roundtrip(tmp_path):
    """stream-agg -> stop implicit (full run), rescale via CLI, resume at the
    new width re-emits nothing and the checkpoint reports the new count."""
    import glob
    import json

    from core_ray.synth import write_tokens_table

    ind, out = str(tmp_path / "in"), str(tmp_path / "out")
    write_tokens_table(ind, n_rows=4000, rows_per_file=1000)
    main(["stream-agg", "--input-dir", ind, "--out-dir", out,
          "--window-s", "60", "--num-partitions", "4"])
    res = main(["rescale", "--out-dir", out, "--num-partitions", "6"])
    assert res["old"] == 4 and res["new"] == 6
    shape = json.load(open(f"{out}/manifests/job.json"))
    assert shape["num_partitions"] == 6
    res2 = main(["stream-agg", "--input-dir", ind, "--out-dir", out,
                 "--window-s", "60", "--num-partitions", "6", "--resume"])
    assert res2["totals"]["rows"] == 0  # nothing re-emitted after rescale
