"""Stage registry + config-driven plan builder (SURVEY.md §2.6).

The reference exposes a ``Registry`` with ``register(name)`` /``get`` /
``list_items`` and builds tasks from a YAML config
(pdf_extract_kit/registry/registry.py:1-23, utils/config_loader.py:31-47).
Our equivalent registers *stages*; a pipeline spec is an ordered list of
stage entries, each with the map_batches sizing knobs, and the builder folds
them over a Dataset.

Adding a stage: write a callable (stateless fn) or callable class (actor
pool), decorate with ``@STAGE_REGISTRY.register("name")``, reference it from
the pipeline spec.  Model backends are constructor args of the stage class,
so alternate backends (the LayoutLMv3-vs-YOLO switch of the reference) are
config values, not code changes.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._items: Dict[str, Any] = {}

    def register(self, name: str):
        def deco(obj):
            if name in self._items:
                raise KeyError(f"{self.kind} '{name}' already registered")
            self._items[name] = obj
            return obj
        return deco

    def get(self, name: str):
        try:
            return self._items[name]
        except KeyError:
            raise KeyError(f"unknown {self.kind} '{name}'; "
                           f"registered: {sorted(self._items)}") from None

    def list_items(self) -> List[str]:
        return sorted(self._items)


STAGE_REGISTRY = Registry("stage")


@dataclass
class StageSpec:
    """One pipeline step: a registered stage plus its execution sizing.
    ``num_gpus`` / ``accelerator_type`` mirror the reference's per-task
    device configs (configs/layout_detection.yaml:12 `device: cuda`) and
    are forwarded into the stage's map_batches ray_remote_args; Ray
    requires an explicit ``batch_size`` on GPU stages."""
    name: str
    batch_size: Optional[int] = None
    concurrency: Optional[int] = None   # actor-pool size for class stages
    num_cpus: Optional[float] = None
    num_gpus: Optional[float] = None    # per-actor/task GPU reservation
    accelerator_type: Optional[str] = None   # e.g. "A100" (Ray constraint)
    options: Dict[str, Any] = field(default_factory=dict)  # ctor/partial kwargs


def build_pipeline(ds, specs: List[StageSpec]):
    """Fold the stage specs over a Dataset as map_batches steps.  Callable
    classes run on actor pools (concurrency required); plain functions run
    as autoscaling tasks."""
    import functools

    for spec in specs:
        stage = STAGE_REGISTRY.get(spec.name)
        kwargs: Dict[str, Any] = {"batch_format": "pyarrow"}
        if spec.batch_size is not None:
            kwargs["batch_size"] = spec.batch_size
        if spec.num_cpus is not None:
            kwargs["num_cpus"] = spec.num_cpus
        if spec.num_gpus is not None:
            kwargs["num_gpus"] = spec.num_gpus
        if spec.accelerator_type is not None:
            kwargs["accelerator_type"] = spec.accelerator_type
        if inspect.isclass(stage):
            kwargs["concurrency"] = spec.concurrency or 2
            if spec.options:
                kwargs["fn_constructor_kwargs"] = spec.options
            ds = ds.map_batches(stage, **kwargs)
        else:
            fn = (functools.partial(stage, **spec.options)
                  if spec.options else stage)
            ds = ds.map_batches(fn, **kwargs)
    return ds


def pipeline_from_config(ds, config: List[dict]):
    """Build from plain dicts (e.g. parsed YAML/JSON):
    ``[{"name": "layout", "concurrency": 4, "batch_size": 64}, ...]``."""
    return build_pipeline(ds, [StageSpec(**entry) for entry in config])


def load_pipeline_yaml(path: str):
    """Parse a YAML pipeline spec (the reference's config-driven task
    instantiation, utils/config_loader.py:6-15 + 31-47) into StageSpecs:

        stages:
          - name: explode_pages
          - name: layout
            concurrency: 4
            batch_size: 64
            options: {backend: mock}

    Note: fixed per-stage ``concurrency`` values are reservations — if the
    stacked actor pools reserve more CPUs than the cluster has, the
    streaming executor stalls waiting for actors.  Size them so
    sum(concurrency × num_cpus) fits the cluster (ExtractConfig.for_cpus
    does this automatically for the flagship pipeline).
    """
    import yaml
    with open(path) as f:
        doc = yaml.safe_load(f)
    if not isinstance(doc, dict) or "stages" not in doc:
        raise ValueError(f"pipeline spec {path!r} must be a mapping with a "
                         f"top-level 'stages' list")
    return [StageSpec(**entry) for entry in doc["stages"]]
