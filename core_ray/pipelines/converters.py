"""JSON ⇄ PipelineJob converters (reference
``pipelines/converters/pipeline_job_json.py:27-130``).

The reference serializes a pipeline job as
``{"name", "description", "task_list": [{"name", "step_list": [{"name",
"component": "<ClassName>", "component_parameters": {...},
"depends_on_step": [...]}]}]}`` and resolves component names by attribute
lookup over a star-imported module namespace.  Here the same wire format is
kept, but resolution goes through an EXPLICIT registry built from the
engine's component modules (no ``import *`` namespace scanning), and the
instantiated component remembers its name + parameters so a job can be
serialized back to the identical JSON (full round-trip, which the reference
only supports via pydantic models).

``pipeline_secret`` parameter wrappers (reference
``pipeline_job_json.py:53-85``) decode to :class:`PipelineSecret` pointers
at convert time and resolve to their VALUES only at execution time
(reference ``execute/job.py:141-152``) — a step with secret parameters is
instantiated lazily behind a deferred wrapper so converting a job never
requires the vault to be reachable, and serializing a job never leaks a
secret value (the (type, vault, key) pointer round-trips instead).
"""

from __future__ import annotations

import inspect
import json

from .framework import (
    DestinationComponent,
    PipelineJob,
    PipelineStep,
    SourceComponent,
    TransformerComponent,
)
from .secrets import SECRET_PROVIDERS, PipelineSecret

_INTERFACES = (SourceComponent, TransformerComponent, DestinationComponent)

# modules scanned for concrete component classes, by dotted suffix
_COMPONENT_MODULES = (
    "core_ray.stages.transformers",
    "core_ray.stages.vendors",
    "core_ray.stages.binary_sources",
    "core_ray.stages.weather_model",
    "core_ray.stages.ml_prep",
    "core_ray.stages.multimodal",
    "core_ray.stages.rest_api",
    "core_ray.stages.python_destinations",
    "core_ray.stages.ecmwf",
    "core_ray.sources.python_sources",
    "core_ray.sources.iso",
    "core_ray.sources.bus",
    "core_ray.pipelines.logging",
    "core_ray.pipelines.converters",  # the generic adapters below
)

_registry: dict[str, type] | None = None

# ds-function transformers addressable from JSON via FunctionTransformer —
# an allow-list of engine functions with (ds_or_source, **params) signatures
_FUNCTION_TRANSFORMS = {
    "binary_to_string": ("core_ray.stages.transformers", "binary_to_string"),
    "pcdm_to_json": ("core_ray.stages.transformers", "pcdm_to_json"),
    "token_count": ("core_ray.functions", "token_count"),
    "token_count_bpe": ("core_ray.functions", "token_count_bpe"),
    "quality_score": ("core_ray.functions", "quality_score"),
    "repetition_stats": ("core_ray.functions", "repetition_stats"),
    "corpus_filter": ("core_ray.functions", "corpus_filter"),
    "corpus_stats": ("core_ray.functions", "corpus_stats"),
    "fingerprint": ("core_ray.functions", "fingerprint"),
    "dedup_exact": ("core_ray.functions", "dedup_exact"),
    "pii_scrub": ("core_ray.functions", "pii_scrub"),
    "dedup_near": ("core_ray.functions", "dedup_near"),
    "jaccard_pairs": ("core_ray.functions", "jaccard_pairs"),
    "dup_shingle_coverage": ("core_ray.functions", "dup_shingle_coverage"),
}


class ParquetSource(SourceComponent):
    """Generic file source so JSON jobs can start from parquet on disk."""

    def __init__(self, path: str, columns: list[str] | None = None):
        self.path = path
        self.columns = columns

    def read_batch(self):
        import ray.data

        return ray.data.read_parquet(self.path, columns=self.columns)


class FunctionTransformer(TransformerComponent):
    """Adapter exposing the engine's function-style transforms
    (``fn(dataset, **params) -> dataset``) as JSON-addressable components.
    ``fn`` must name an allow-listed engine function."""

    def __init__(self, fn: str, **params):
        import importlib

        entry = _FUNCTION_TRANSFORMS.get(fn)
        if entry is None:
            raise ValueError(
                f"unknown transform function {fn!r}; known: "
                f"{sorted(_FUNCTION_TRANSFORMS)}"
            )
        self._fn = getattr(importlib.import_module(entry[0]), entry[1])
        self.fn = fn
        self.params = params

    def transform(self, ds):
        return self._fn(ds, **self.params)


class ParquetDestination(DestinationComponent):
    """Generic file destination: writes the Dataset as partitioned parquet
    and reports the row count."""

    def __init__(self, path: str, partition_cols: list[str] | None = None):
        self.path = path
        self.partition_cols = partition_cols

    def write_batch(self, ds):
        kwargs = {}
        if self.partition_cols:
            kwargs["partition_cols"] = self.partition_cols
        ds.write_parquet(self.path, **kwargs)
        return {"path": self.path}


def _decode_secret(value):
    """``{"pipeline_secret": {...}}`` wire dict -> :class:`PipelineSecret`
    (reference ``pipeline_job_json.py:53-62``); anything else passes
    through.  Unknown provider names fail loudly rather than silently
    passing the raw dict into a component."""
    if isinstance(value, dict) and "pipeline_secret" in value:
        spec = value["pipeline_secret"]
        cls = SECRET_PROVIDERS.get(spec.get("type"))
        if cls is None:
            raise ValueError(
                f"unknown secret provider {spec.get('type')!r}; known: "
                f"{sorted(SECRET_PROVIDERS)}"
            )
        return PipelineSecret(type=cls, vault=spec["vault"], key=spec["key"])
    return value


def _decode_secret_params(params: dict) -> tuple[dict, bool]:
    """Decode secret wrappers at the top level and one dict level deep
    (the two places the reference looks); returns (params, any_found)."""
    out: dict = {}
    found = False
    for key, value in params.items():
        decoded = _decode_secret(value)
        if isinstance(decoded, PipelineSecret):
            found = True
        elif isinstance(decoded, dict):
            inner = {k: _decode_secret(v) for k, v in decoded.items()}
            if any(isinstance(v, PipelineSecret) for v in inner.values()):
                found = True
            decoded = inner
        out[key] = decoded
    return out, found


def _resolve_secret_params(params: dict) -> dict:
    """Replace every :class:`PipelineSecret` (top level and one dict level
    deep) with its ``get()`` value — called only at execution time."""
    out: dict = {}
    for key, value in params.items():
        if isinstance(value, PipelineSecret):
            out[key] = value.resolve()
        elif isinstance(value, dict):
            out[key] = {
                k: (v.resolve() if isinstance(v, PipelineSecret) else v)
                for k, v in value.items()
            }
        else:
            out[key] = value
    return out


def _encode_secret_params(params: dict) -> dict:
    """Inverse of :func:`_decode_secret_params` for serialization: secrets
    back to their wire dicts, values never included."""
    out: dict = {}
    for key, value in params.items():
        if isinstance(value, PipelineSecret):
            out[key] = value.to_wire()
        elif isinstance(value, dict):
            out[key] = {
                k: (v.to_wire() if isinstance(v, PipelineSecret) else v)
                for k, v in value.items()
            }
        else:
            out[key] = value
    return out


class _DeferredSecretMixin:
    """Lazily instantiates the real component on first use, resolving
    secret parameters at that moment (the reference's DI factory does the
    same: providers are built per step and secrets fetched when the factory
    fires, ``execute/job.py:138-156``)."""

    def __init__(self, cls: type, params: dict):
        self._cls = cls
        self._params = params
        self._real = None

    def _component(self):
        if self._real is None:
            self._real = self._cls(**_resolve_secret_params(self._params))
        return self._real

    def system_type(self) -> str:
        return "ray-data"


class _DeferredSource(_DeferredSecretMixin, SourceComponent):
    def read_batch(self):
        return self._component().read_batch()


class _DeferredTransformer(_DeferredSecretMixin, TransformerComponent):
    def transform(self, ds):
        return self._component().transform(ds)


class _DeferredDestination(_DeferredSecretMixin, DestinationComponent):
    def write_batch(self, ds):
        return self._component().write_batch(ds)


def _make_deferred(cls: type, params: dict):
    for iface, wrapper in (
        (SourceComponent, _DeferredSource),
        (TransformerComponent, _DeferredTransformer),
        (DestinationComponent, _DeferredDestination),
    ):
        if issubclass(cls, iface):
            return wrapper(cls, params)
    raise TypeError(f"{cls.__name__} implements no component interface")


def component_registry() -> dict[str, type]:
    """Name -> class for every concrete Source/Transformer/Destination the
    engine exports from its component modules (built once, lazily)."""
    global _registry
    if _registry is None:
        import importlib

        reg: dict[str, type] = {}
        for modname in _COMPONENT_MODULES:
            try:
                mod = importlib.import_module(modname)
            except ImportError:
                continue
            for name, obj in vars(mod).items():
                if (
                    inspect.isclass(obj)
                    and issubclass(obj, _INTERFACES)
                    and obj not in _INTERFACES
                    and not inspect.isabstract(obj)
                    and obj.__module__ == modname
                ):
                    reg[name] = obj
        _registry = reg
    return _registry


class PipelineJobFromJsonConverter:
    """Builds a runnable :class:`PipelineJob` from the reference JSON format.

    Steps from every task are flattened into the single topo-ordered step
    list the executor runs (the reference runs tasks sequentially; with
    dependencies expressed per step the flattening preserves order).
    """

    def __init__(self, pipeline_json: str):
        self.pipeline_json = pipeline_json

    def convert(self) -> PipelineJob:
        spec = json.loads(self.pipeline_json)
        registry = component_registry()
        steps: list[PipelineStep] = []
        for task in spec["task_list"]:
            for raw in task["step_list"]:
                params, has_secrets = _decode_secret_params(
                    raw.get("component_parameters", {})
                )
                cls_name = raw["component"]
                cls = registry.get(cls_name)
                if cls is None:
                    raise ValueError(
                        f"unknown component {cls_name!r}; known: "
                        f"{sorted(registry)[:10]}..."
                    )
                if has_secrets:
                    comp = _make_deferred(cls, params)
                else:
                    comp = cls(**params)
                comp._component_name = cls_name
                comp._component_parameters = dict(params)
                steps.append(
                    PipelineStep(
                        name=raw["name"],
                        component=comp,
                        depends_on=list(raw.get("depends_on_step", [])),
                    )
                )
        return PipelineJob(name=spec["name"], steps=steps)


class PipelineJobToJsonConverter:
    """Serializes a :class:`PipelineJob` back to the reference JSON format.

    Components built by :class:`PipelineJobFromJsonConverter` carry their
    name and parameters; hand-built components are introspected from their
    instance ``__dict__`` filtered to their ``__init__`` signature (only
    JSON-representable values survive)."""

    def __init__(self, pipeline_job: PipelineJob):
        self.pipeline_job = pipeline_job

    @staticmethod
    def _step_dict(step: PipelineStep) -> dict:
        comp = step.component
        name = getattr(comp, "_component_name", type(comp).__name__)
        params = getattr(comp, "_component_parameters", None)
        if params is None:
            sig = inspect.signature(type(comp).__init__)
            params = {}
            for k, v in vars(comp).items():
                p = sig.parameters.get(k)
                if p is None or not _jsonable(v):
                    continue
                if p.kind is inspect.Parameter.VAR_KEYWORD:
                    # a stored **kwargs dict must FLATTEN back into the
                    # parameters, not nest under the kwargs name — nesting
                    # round-trips into component(**{name: {...}}) and the
                    # component then passes a dict where scalars belong
                    if isinstance(v, dict):
                        params.update({kk: vv for kk, vv in v.items() if _jsonable(vv)})
                    continue
                params[k] = v
        out = {
            "name": step.name,
            "component": name,
            "component_parameters": _encode_secret_params(params),
        }
        if step.depends_on:
            out["depends_on_step"] = list(step.depends_on)
        return out

    def convert(self) -> str:
        job = self.pipeline_job
        return json.dumps(
            {
                "name": job.name,
                "task_list": [
                    {
                        "name": f"{job.name}-task",
                        "step_list": [self._step_dict(s) for s in job.steps],
                    }
                ],
            }
        )


def _jsonable(v) -> bool:
    try:
        json.dumps(v)
        return True
    except (TypeError, ValueError):
        return False


__all__ = [
    "component_registry",
    "PipelineJobFromJsonConverter",
    "PipelineJobToJsonConverter",
]
