"""Pipeline component framework (reference ``pipelines/`` — SURVEY.md §2.2).

The reference wires Source → Transformer → Destination components through a
DI-driven job executor (``pipelines/execute/job.py:27-205``) that topo-orders
steps and threads DataFrames between them.  Here the same extension surface —
component classes with ``read_batch`` / ``transform`` / ``write_batch`` — is
kept, but every component operates on one lazy ``ray.data.Dataset`` chain and
execution is the Ray Data streaming executor; nothing materializes until a
destination consumes.

Citations: interfaces mirror ``pipelines/sources/interfaces.py``,
``transformers/interfaces.py``, ``destinations/interfaces.py``; the step graph
mirrors ``pipelines/execute/models.py:38-100`` (``depends_on_step`` /
``provide_output_to_step``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import ray.data


class SourceComponent:
    """Produces a Dataset. Override ``read_batch``."""

    def read_batch(self) -> ray.data.Dataset:
        raise NotImplementedError

    def system_type(self) -> str:
        return "ray-data"


class TransformerComponent:
    """Dataset -> Dataset. Override ``transform``."""

    def transform(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        raise NotImplementedError

    def system_type(self) -> str:
        return "ray-data"


class DestinationComponent:
    """Consumes a Dataset. Override ``write_batch`` (returns a result summary)."""

    def write_batch(self, ds: ray.data.Dataset) -> Any:
        raise NotImplementedError

    def system_type(self) -> str:
        return "ray-data"


@dataclass
class PipelineStep:
    name: str
    component: SourceComponent | TransformerComponent | DestinationComponent
    depends_on: list[str] = field(default_factory=list)


@dataclass
class PipelineJob:
    name: str
    steps: list[PipelineStep]


class PipelineJobExecute:
    """Topo-orders steps and threads Datasets between them (lazy end to end).

    A transformer with several dependencies receives their union; a
    destination consumes its single dependency. Returns
    {step_name: Dataset | write result}.
    """

    def __init__(self, job: PipelineJob):
        self.job = job

    def _ordered(self) -> list[PipelineStep]:
        by_name = {s.name: s for s in self.job.steps}
        seen: dict[str, int] = {}
        order: list[PipelineStep] = []

        def visit(name: str, stack: tuple = ()):
            if name in stack:
                raise ValueError(f"cycle at step {name!r}")
            if seen.get(name):
                return
            step = by_name.get(name)
            if step is None:
                raise ValueError(f"unknown step dependency: {name!r}")
            for dep in step.depends_on:
                visit(dep, stack + (name,))
            seen[name] = 1
            order.append(step)

        for s in self.job.steps:
            visit(s.name)
        return order

    def run(self) -> dict[str, Any]:
        results: dict[str, Any] = {}
        for step in self._ordered():
            comp = step.component
            if isinstance(comp, SourceComponent):
                results[step.name] = comp.read_batch()
            elif isinstance(comp, TransformerComponent):
                deps = [results[d] for d in step.depends_on]
                if not deps:
                    raise ValueError(f"transformer step {step.name!r} has no input")
                ds = deps[0]
                for other in deps[1:]:
                    ds = ds.union(other)
                results[step.name] = comp.transform(ds)
            elif isinstance(comp, DestinationComponent):
                deps = [results[d] for d in step.depends_on]
                if len(deps) != 1:
                    raise ValueError(
                        f"destination step {step.name!r} needs exactly one input"
                    )
                results[step.name] = comp.write_batch(deps[0])
            else:
                raise TypeError(f"unknown component type for step {step.name!r}")
        return results


def _seed_fsspec_http_shim() -> None:
    """Make ``from fsspec.implementations.http import HTTPFileSystem``
    deterministic under concurrent Dataset construction.

    Ray's path resolver does that import per ``read_parquet`` and catches
    only ``ModuleNotFoundError``; in this environment the module always
    fails mid-import (no aiohttp), and two threads racing it can observe the
    partially-initialized module — surfacing as a plain ``ImportError`` that
    Ray does NOT catch.  If the real module is unimportable, register a shim
    exposing a dummy ``HTTPFileSystem`` (Ray only uses it in ``isinstance``
    checks for local paths, which stay False) so every later import succeeds
    instantly from ``sys.modules``."""
    import sys

    if "fsspec.implementations.http" in sys.modules:
        return
    try:
        import fsspec.implementations.http  # noqa: F401
    except Exception:
        import types

        try:
            import fsspec.implementations  # noqa: F401
        except Exception:
            return
        shim = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # pragma: no cover - marker class only
            def __init__(self, *a, **k):
                raise ImportError("fsspec http support requires aiohttp")

        shim.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = shim


def run_batch(queries: dict[str, Any], max_workers: int = 4) -> dict[str, Any]:
    """Concurrent fan-out of independent query callables (reference
    ``queries/time_series/batch.py:22-86`` ThreadPoolExecutor), order
    preserved by key."""
    from concurrent.futures import ThreadPoolExecutor

    _seed_fsspec_http_shim()

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futures = {name: pool.submit(fn) for name, fn in queries.items()}
        return {name: f.result() for name, f in futures.items()}


def lookup_before_get(query_fn, tag_table_mapping: dict[str, list[str]], **params):
    """Lookup-table fan-out (reference ``api/v1/common.py:264``): a mapping
    endpoint assigns each requested tag to its owning table; the same query
    runs once per table with that table's tag subset and the results are
    unioned.  The per-table queries are lazy Datasets, so one Ray execution
    runs them concurrently — the ``threadpool_max_workers`` knob of the
    reference becomes ordinary Ray parallelism."""
    parts = [
        query_fn(source=table, tags=sorted(tags), **params)
        for table, tags in sorted(tag_table_mapping.items())
        if tags
    ]
    if not parts:
        raise ValueError("tag_table_mapping resolved to no tables")
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
