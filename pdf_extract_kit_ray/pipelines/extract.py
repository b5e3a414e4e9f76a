"""Flagship pipeline: interleaved raw documents -> extracted ordered spans.

Ray-Data-first composition of the stages in stages/extract_stages.py.  The
pipeline is lazy end-to-end; the single all-to-all exchange is the final
``groupby(doc_id)`` reassembly.  Stage sizing is parameterized so bench runs
can sweep it; defaults target a 32-CPU node and scale out on a cluster by
raising ``concurrency`` per stage (actors are the unit of placement).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import ray.data

from ..stages.extract_stages import (
    LayoutStage,
    MFDStage,
    MFRStage,
    OCRStage,
    assemble_page_spans,
    explode_pages,
    reassemble_document,
)


@dataclass
class ExtractConfig:
    """Per-stage knobs.  ``concurrency`` is the actor-pool size per model
    stage; ``actor_num_cpus`` is the per-actor CPU reservation.  SIZING RULE:
    sum(concurrency * actor_num_cpus) across stages must stay safely below
    the node/cluster CPU count or the pools starve the stateless stages
    (actor pools RESERVE their CPUs for the run's lifetime)."""
    layout_concurrency: int = 4
    mfd_concurrency: int = 2
    mfr_concurrency: int = 4
    ocr_concurrency: int = 8
    actor_num_cpus: float = 1.0
    page_batch_size: int = 64
    mfr_batch_size: int = 64      # pages per MFR batch (~100+ crops, the
                                  # reference's cross-page batch analog)

    @classmethod
    def for_cpus(cls, n: int) -> "ExtractConfig":
        """Size the pools to ~2/3 of n CPUs, leaving headroom for the
        stateless explode/assemble/shuffle tasks."""
        n = max(int(n), 2)
        return cls(layout_concurrency=max(1, n // 6),
                   mfd_concurrency=max(1, n // 10),
                   mfr_concurrency=max(1, n // 8),
                   ocr_concurrency=max(1, n // 3),
                   actor_num_cpus=0.5 if n < 8 else 1.0)


def extract_documents(ds: "ray.data.Dataset",
                      config: Optional[ExtractConfig] = None) -> "ray.data.Dataset":
    """raw docs Dataset (DOC_SCHEMA) -> extracted docs Dataset (DOC_SCHEMA)."""
    cfg = config or ExtractConfig()
    cpus = cfg.actor_num_cpus
    pages = ds.map_batches(explode_pages, batch_format="pyarrow")
    pages = pages.map_batches(LayoutStage, concurrency=cfg.layout_concurrency,
                              batch_size=cfg.page_batch_size, num_cpus=cpus,
                              batch_format="pyarrow")
    pages = pages.map_batches(MFDStage, concurrency=cfg.mfd_concurrency,
                              batch_size=cfg.page_batch_size, num_cpus=cpus,
                              batch_format="pyarrow")
    pages = pages.map_batches(MFRStage, concurrency=cfg.mfr_concurrency,
                              batch_size=cfg.mfr_batch_size, num_cpus=cpus,
                              batch_format="pyarrow")
    pages = pages.map_batches(OCRStage, concurrency=cfg.ocr_concurrency,
                              batch_size=cfg.page_batch_size, num_cpus=cpus,
                              batch_format="pyarrow")
    page_spans = pages.map_batches(assemble_page_spans, batch_format="pyarrow")
    return page_spans.groupby("doc_id").map_groups(reassemble_document,
                                                   batch_format="pyarrow")


def read_corpus(path: str) -> "ray.data.Dataset":
    """Read an interleaved document table.  Lance is the production format
    (north rule); this sandbox has no lancedb wheel, so fall back to parquet
    transparently — the Dataset downstream is identical either way."""
    try:
        import lance  # noqa: F401
        return ray.data.read_lance(path)
    except ImportError:
        return ray.data.read_parquet(path)
