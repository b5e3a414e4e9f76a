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
    FusedExtractStage,
    LayoutStage,
    MFDStage,
    MFRStage,
    OCRStage,
    assemble_page_spans,
    explode_pages,
    fused_extract_batch,
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
    page_batch_size: int = 256   # per-page results are batch-independent;
                                  # 256 amortizes the Arrow<->Python batch
                                  # conversion (measured ~7% at 16 cpus)
    mfr_batch_size: int = 64      # pages per MFR batch (~100+ crops, the
                                  # reference's cross-page batch analog)
    # stage_mode picks the execution shape (all byte-identical, pinned by
    # the e2e test):
    #   "fused_tasks"  — every model step + assembly fused into one stateless
    #                    task transform.  The sandbox default: mock backends
    #                    hold no state, so plain tasks are the idiomatic
    #                    shape (SURVEY.md §3 stateless-vs-stateful rule) and
    #                    let the executor use every CPU.
    #   "fused_actors" — same fusion on an actor pool (single shared-resource
    #                    backend that loads state once per worker).
    #   "split_actors" — one actor pool PER model stage; the deployment
    #                    shape for heterogeneous (multi-GPU-class) backends.
    stage_mode: str = "fused_tasks"
    fused_concurrency: int = 24
    # "reference" = the equality contract (ymin*3000+xmin); "columns" =
    # optional two-column-aware ordering (engine extension, assemble.py)
    reading_order: str = "reference"
    # config-selected layout backend (the reference's YOLO-vs-LayoutLMv3
    # switch): "mock" or "mock2" (higher score threshold) in the sandbox
    layout_backend: str = "mock"
    # config-selected render-geometry backend (S3 vs S4): "fitz" = dpi-144
    # with the >3000px dpi-72 downshift (the reference main path);
    # "pdf2image" = the poppler variant's uniform 200-dpi render
    # (pdf_extract_kit/utils/pdf_utils.py:3-5, no size cap)
    render_backend: str = "fitz"
    # reassembly bucket count (0 = auto: functions/agg._default_num_coarse,
    # ~4x cluster CPUs).  Docs co-bucket by hash(doc_id) and each bucket
    # reassembles VECTORIZED (one lexsort + one ListArray build) — never
    # a per-doc Python dispatch; size it so corpus_spans/buckets fits a
    # worker heap at scale.
    reassembly_buckets: int = 0
    # >0 salts the reassembly shuffle key into page ranges of this many
    # pages (two-phase reassembly): enable when the corpus has page-count
    # outliers whose span rows would exceed one group's heap (SURVEY §7
    # stage 5).  0 = single groupby(doc_id), byte-identical output either way.
    salt_pages: int = 0
    # >0 pads each mock model call with a deterministic FLOP burn of roughly
    # this many ms per page (see mocks.burn_compute) so scale measurements
    # reflect model-bound stages; never changes outputs.  Tests use 0.
    emulate_inference_ms: float = 0.0
    # GPU plumbing for real model backends on a CUDA cluster (the
    # reference runs every model stage on `device: cuda`,
    # configs/layout_detection.yaml:12): per-actor GPU reservation per
    # model stage (fractions co-locate stages on one GPU) and an optional
    # accelerator type constraint — both forwarded verbatim into the
    # stage's map_batches ray_remote_args.  0 / None = CPU mode (the
    # sandbox default; mock backends never touch CUDA).
    layout_num_gpus: float = 0.0
    mfd_num_gpus: float = 0.0
    mfr_num_gpus: float = 0.0
    ocr_num_gpus: float = 0.0
    fused_num_gpus: float = 0.0
    accelerator_type: Optional[str] = None

    def gpu_kwargs(self, stage: str) -> dict:
        """map_batches resource kwargs for a model stage ('layout',
        'mfd', 'mfr', 'ocr', 'fused'); empty in CPU mode so the sandbox
        plans are byte-identical to pre-GPU builds."""
        kw: dict = {}
        g = getattr(self, f"{stage}_num_gpus")
        if g:
            kw["num_gpus"] = g
        if self.accelerator_type is not None:
            kw["accelerator_type"] = self.accelerator_type
        return kw

    @classmethod
    def for_cpus(cls, n: int, **overrides) -> "ExtractConfig":
        """Size the pools to ~3/4 of n CPUs, leaving headroom for the
        stateless explode/shuffle tasks."""
        n = max(int(n), 2)
        return cls(layout_concurrency=max(1, n // 6),
                   mfd_concurrency=max(1, n // 10),
                   mfr_concurrency=max(1, n // 8),
                   ocr_concurrency=max(1, n // 3),
                   actor_num_cpus=0.5 if n < 8 else 1.0,
                   fused_concurrency=max(1, (3 * n) // 4),
                   **overrides)


def extract_page_spans(ds: "ray.data.Dataset",
                       config: Optional[ExtractConfig] = None) -> "ray.data.Dataset":
    """raw docs Dataset -> per-page ordered span rows (pre-shuffle)."""
    cfg = config or ExtractConfig()
    cpus = cfg.actor_num_cpus
    emulate = cfg.emulate_inference_ms
    pages = ds.map_batches(explode_pages, batch_format="pyarrow",
                           fn_kwargs={"backend": cfg.render_backend})
    if cfg.stage_mode == "fused_tasks":
        return pages.map_batches(
            fused_extract_batch,
            fn_kwargs={"backend": cfg.layout_backend,
                       "emulate_inference_ms": emulate,
                       "reading_order": cfg.reading_order},
            batch_size=cfg.page_batch_size, batch_format="pyarrow",
            **cfg.gpu_kwargs("fused"))
    if cfg.stage_mode == "fused_actors":
        return pages.map_batches(
            FusedExtractStage, concurrency=cfg.fused_concurrency,
            fn_constructor_kwargs={"backend": cfg.layout_backend,
                                   "emulate_inference_ms": emulate,
                                   "reading_order": cfg.reading_order},
            batch_size=cfg.page_batch_size, num_cpus=cpus,
            batch_format="pyarrow", **cfg.gpu_kwargs("fused"))
    if cfg.stage_mode != "split_actors":
        raise ValueError(f"unknown stage_mode {cfg.stage_mode!r}")
    kw = {"fn_constructor_kwargs": {"emulate_inference_ms": emulate},
          "num_cpus": cpus, "batch_format": "pyarrow"}
    pages = pages.map_batches(
        LayoutStage, concurrency=cfg.layout_concurrency,
        batch_size=cfg.page_batch_size, num_cpus=cpus,
        batch_format="pyarrow",
        fn_constructor_kwargs={"backend": cfg.layout_backend,
                               "emulate_inference_ms": emulate},
        **cfg.gpu_kwargs("layout"))
    pages = pages.map_batches(MFDStage, concurrency=cfg.mfd_concurrency,
                              batch_size=cfg.page_batch_size,
                              **cfg.gpu_kwargs("mfd"), **kw)
    pages = pages.map_batches(MFRStage, concurrency=cfg.mfr_concurrency,
                              batch_size=cfg.mfr_batch_size,
                              **cfg.gpu_kwargs("mfr"), **kw)
    pages = pages.map_batches(OCRStage, concurrency=cfg.ocr_concurrency,
                              batch_size=cfg.page_batch_size,
                              **cfg.gpu_kwargs("ocr"), **kw)
    return pages.map_batches(
        assemble_page_spans,
        fn_kwargs={"reading_order": cfg.reading_order},
        batch_format="pyarrow")


def detect_salt_pages(ds: "ray.data.Dataset", whale_pages: int = 2000,
                      salt_pages: int = 256) -> int:
    """Page-count skew probe (SURVEY §7 stage 5): one column-pruned pass
    over the raw corpus counting pages per doc (a page starts at every
    ``offset == 0``), reduced to per-block maxima — the driver sees one
    small row per block.  Returns ``salt_pages`` if any document exceeds
    ``whale_pages`` pages (its span rows would dominate one reassembly
    group), else 0.  Cost: one extra scan of the ``spans`` column; on a
    known corpus set ``ExtractConfig.salt_pages`` directly instead."""
    import numpy as np
    import pyarrow as pa

    def block_max(batch: pa.Table) -> pa.Table:
        col = batch.column("spans")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offsets = col.offsets.to_numpy()
        flat_off = col.values.field("offset").to_numpy()
        starts = (flat_off == 0).astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(starts)])
        pages_per_doc = cum[offsets[1:]] - cum[offsets[:-1]]
        mx = int(pages_per_doc.max()) if len(pages_per_doc) else 0
        return pa.table({"max_pages": pa.array([mx], pa.int64())})

    maxima = ds.select_columns(["spans"]).map_batches(
        block_max, batch_format="pyarrow").take_all()
    max_pages = max((r["max_pages"] for r in maxima), default=0)
    return salt_pages if max_pages > whale_pages else 0


def extract_documents(ds: "ray.data.Dataset",
                      config: Optional[ExtractConfig] = None) -> "ray.data.Dataset":
    """raw docs Dataset (DOC_SCHEMA) -> extracted docs Dataset (DOC_SCHEMA).
    The groupby(doc_id) is the pipeline's single all-to-all exchange; with
    ``salt_pages`` set it becomes two exchanges — (doc_id, page-range salt)
    then a per-doc merge of pre-assembled chunk rows — so an extreme
    page-count outlier never lands all its span rows in one group."""
    import functools

    from ..stages.extract_stages import (add_reassembly_bucket, add_salt,
                                         merge_doc_chunks, reassemble_bucket,
                                         reassemble_chunk)

    cfg = config or ExtractConfig()
    page_spans = extract_page_spans(ds, cfg)
    if cfg.salt_pages > 0:
        salted = page_spans.map_batches(
            functools.partial(add_salt, salt_pages=cfg.salt_pages),
            batch_format="pyarrow")
        chunks = salted.groupby(["doc_id", "salt"]).map_groups(
            reassemble_chunk, batch_format="pyarrow")
        return chunks.groupby("doc_id").map_groups(merge_doc_chunks,
                                                   batch_format="pyarrow")
    # bucketed reassembly: shuffle on a small int key, then reassemble
    # every doc of a bucket in one vectorized pass — per-BUCKET dispatch,
    # never per-doc (the coarse_grouped_aggregate shape applied to the
    # pipeline's one all-to-all)
    nb = cfg.reassembly_buckets
    if nb <= 0:
        from ..functions.agg import _default_num_coarse
        nb = _default_num_coarse()
    tagged = page_spans.map_batches(
        functools.partial(add_reassembly_bucket, num_buckets=nb),
        batch_format="pyarrow")
    return tagged.groupby("__bucket").map_groups(reassemble_bucket,
                                                 batch_format="pyarrow")


def extract_markdown(ds: "ray.data.Dataset",
                     config: Optional[ExtractConfig] = None) -> "ray.data.Dataset":
    """raw docs Dataset -> (doc_id, markdown): per-page markdown emission
    joined with blank lines, the reference's .md sink (SURVEY.md §2.1 S8,
    pdf2markdown.py:341-347) as a projection of the span stream."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    # per-kind (prefix, suffix) of the reference's per-page emission
    # (pdf2markdown.py:312-324; functions/assemble.spans_to_markdown is
    # the row-wise twin, kept for the YAML/unit surface) — kinds outside
    # this map contribute nothing
    affix = {"title": ("\n# ", "\n"),
             "isolated_formula": ("\n", "\n"),
             "plain_text": (" ", " "),
             "figure_caption": (" ", " "),
             "table_caption": (" ", " ")}

    def doc_markdown(group: pa.Table) -> pa.Table:
        """Arrow-direct markdown assembly (the `_spans_list_column` idiom):
        fragments build via a dictionary-encoded kind->affix gather +
        ``binary_join_element_wise``; pages slice by offsets off the sorted
        (page_no, block_idx) order — a whale doc never pays per-span
        Python-dict cost."""
        group = group.sort_by([("page_no", "ascending"),
                               ("block_idx", "ascending")])
        doc_id = group.column("doc_id")[0].as_py()
        n = group.num_rows
        kinds = group.column("kind").combine_chunks()
        denc = pc.dictionary_encode(kinds)
        kind_vocab = denc.dictionary.to_pylist()          # tiny
        pre_v = [affix.get(k, ("", ""))[0] for k in kind_vocab]
        suf_v = [affix.get(k, ("", ""))[1] for k in kind_vocab]
        emit_v = [k in affix for k in kind_vocab]
        idx = denc.indices
        pre = pa.array(pre_v, pa.string()).take(idx)
        suf = pa.array(suf_v, pa.string()).take(idx)
        emit = pa.array(emit_v, pa.bool_()).take(idx)
        text = pc.fill_null(group.column("text").combine_chunks(), "")
        frag = pc.if_else(emit,
                          pc.binary_join_element_wise(pre, text, suf, ""),
                          "")
        # page boundaries off the sorted page_no column
        pages = group.column("page_no").to_numpy(zero_copy_only=False)
        starts = (np.flatnonzero(np.r_[True, pages[1:] != pages[:-1]])
                  if n else np.zeros(0, np.int64))
        offsets = pa.array(np.r_[starts, n].astype(np.int32), pa.int32())
        page_md = pc.binary_join(
            pa.ListArray.from_arrays(offsets, frag), "")
        md = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array([0, len(page_md)], pa.int32()),
                page_md.combine_chunks() if isinstance(page_md,
                                                       pa.ChunkedArray)
                else page_md), "\n\n")
        return pa.table({"doc_id": pa.array([doc_id]),
                         "markdown": md})

    page_spans = extract_page_spans(ds, config)
    return page_spans.groupby("doc_id").map_groups(doc_markdown,
                                                   batch_format="pyarrow")


def extract_table_sources(ds: "ray.data.Dataset",
                          config: Optional[ExtractConfig] = None) -> "ray.data.Dataset":
    """Table-parsing pipeline (M6 under the driver gate): page explode ->
    layout detection -> TableStage parse, projected to one row per detected
    table region: (doc_id, page_no, table_idx, table_source, truncated).

    ``truncated`` marks the reference's ``max_time`` straggler cap
    (struct_eqtable.py max_time:30 -> per-row cutoff yielding an empty
    source); at the default element cap no corpus table trips it, so the
    SQL twin can assert it FALSE while the unit test exercises the
    over-cap path directly."""
    import pyarrow as pa

    from ..stages.extract_stages import LayoutStage, TableStage, explode_pages

    import functools

    cfg = config or ExtractConfig()
    pages = ds.map_batches(explode_pages, batch_format="pyarrow",
                           fn_kwargs={"backend": cfg.render_backend})
    if cfg.stage_mode in ("fused_tasks", "fused_actors"):
        # layout + table parse in one task pass (stateless mocks; the
        # split pools below remain the heterogeneous-backend shape)
        from ..stages.extract_stages import fused_table_batch
        pages = pages.map_batches(
            functools.partial(fused_table_batch, backend=cfg.layout_backend),
            batch_size=cfg.page_batch_size, batch_format="pyarrow")
    else:
        pages = pages.map_batches(
            LayoutStage, concurrency=cfg.layout_concurrency,
            batch_size=cfg.page_batch_size, num_cpus=cfg.actor_num_cpus,
            batch_format="pyarrow",
            fn_constructor_kwargs={"backend": cfg.layout_backend})
        pages = pages.map_batches(
            TableStage, concurrency=cfg.mfd_concurrency,
            batch_size=cfg.page_batch_size, num_cpus=cfg.actor_num_cpus,
            batch_format="pyarrow")

    def explode_tables(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        page_nos = batch.column("page_no").to_pylist()
        tables = batch.column("table_sources").to_pylist()
        out = {"doc_id": [], "page_no": [], "table_idx": [],
               "table_source": [], "truncated": []}
        for doc_id, page_no, srcs in zip(doc_ids, page_nos, tables):
            for idx, src in enumerate(srcs):
                out["doc_id"].append(doc_id)
                out["page_no"].append(page_no)
                out["table_idx"].append(idx)
                out["table_source"].append(src)
                out["truncated"].append(src == "")
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "page_no": pa.array(out["page_no"], pa.int32()),
            "table_idx": pa.array(out["table_idx"], pa.int32()),
            "table_source": pa.array(out["table_source"], pa.string()),
            "truncated": pa.array(out["truncated"], pa.bool_()),
        })

    return pages.map_batches(explode_tables, batch_format="pyarrow")


def _det_chain(ds: "ray.data.Dataset", cfg: ExtractConfig) -> "ray.data.Dataset":
    """Page explode + the four model stages (split actor pools) -> the
    per-page detection table (doc_id, page_no, dims, dets)."""
    from ..stages.extract_stages import (LayoutStage, MFDStage, MFRStage,
                                         OCRStage, explode_pages)
    kw = {"num_cpus": cfg.actor_num_cpus, "batch_format": "pyarrow"}
    pages = ds.map_batches(explode_pages, batch_format="pyarrow",
                           fn_kwargs={"backend": cfg.render_backend})
    pages = pages.map_batches(
        LayoutStage, concurrency=cfg.layout_concurrency,
        batch_size=cfg.page_batch_size,
        fn_constructor_kwargs={"backend": cfg.layout_backend}, **kw)
    pages = pages.map_batches(MFDStage, concurrency=cfg.mfd_concurrency,
                              batch_size=cfg.page_batch_size, **kw)
    pages = pages.map_batches(MFRStage, concurrency=cfg.mfr_concurrency,
                              batch_size=cfg.mfr_batch_size, **kw)
    return pages.map_batches(OCRStage, concurrency=cfg.ocr_concurrency,
                             batch_size=cfg.page_batch_size, **kw)


def extract_reference_json(ds: "ray.data.Dataset",
                           config: Optional[ExtractConfig] = None) -> "ray.data.Dataset":
    """S7 FULL parity: the reference's primary output format — one JSON
    document per input doc, a list of page results
    ``{"layout_dets": [{category_type, poly, score[, latex|text]}...],
    "page_info": {page_no, height, width}}`` (save_json_result,
    pdf_extract_kit/tasks/ocr/task.py:106-114; det record shape
    project/pdf2markdown/scripts/pdf2markdown.py:90-95,158-163).

    Detections come from the same model-stage chain as the flagship;
    formula dets carry ``latex``, OCR text dets carry ``text``, exactly
    the reference's optional-field convention.  Returns (doc_id, json)
    rows; ``json.dumps(ensure_ascii=False)`` like the reference sink."""
    import functools
    import json as _json

    import pyarrow as pa

    cfg = config or ExtractConfig()
    if cfg.stage_mode in ("fused_tasks", "fused_actors"):
        # one fused task pass for the whole model chain (same dets as the
        # split pools, at a fifth of the Arrow<->Python round-trips)
        from ..stages.extract_stages import explode_pages, fused_dets_batch
        pages = ds.map_batches(explode_pages, batch_format="pyarrow",
                           fn_kwargs={"backend": cfg.render_backend}) \
            .map_batches(functools.partial(fused_dets_batch,
                                           backend=cfg.layout_backend,
                                           drop_score=0.5),
                         batch_size=cfg.page_batch_size,
                         batch_format="pyarrow")
    else:
        pages = _det_chain(ds, cfg)

    def page_result(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        page_nos = batch.column("page_no").to_pylist()
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()
        dets_col = batch.column("dets").to_pylist()
        out = {"doc_id": [], "page_no": [], "page_json": []}
        for doc_id, page_no, w, h, dets in zip(doc_ids, page_nos, widths,
                                               heights, dets_col):
            layout_dets = []
            for d in dets:
                rec = {"category_type": d["kind"],
                       "poly": [d["x0"], d["y0"], d["x1"], d["y0"],
                                d["x1"], d["y1"], d["x0"], d["y1"]],
                       "score": d["score"]}
                if d["kind"] in ("inline", "isolated"):
                    rec["latex"] = d["text"]
                elif d["kind"] == "text":
                    rec["text"] = d["text"]
                layout_dets.append(rec)
            result = {"layout_dets": layout_dets,
                      "page_info": {"page_no": max(page_no, 0),
                                    "height": h, "width": w}}
            out["doc_id"].append(doc_id)
            out["page_no"].append(page_no)
            out["page_json"].append(_json.dumps(result, ensure_ascii=False))
        return pa.table({"doc_id": pa.array(out["doc_id"], pa.string()),
                         "page_no": pa.array(out["page_no"], pa.int32()),
                         "page_json": pa.array(out["page_json"], pa.string())})

    def doc_json(group: pa.Table) -> pa.Table:
        group = group.sort_by([("page_no", "ascending")])
        pages_json = [s for p, s in zip(group.column("page_no").to_pylist(),
                                        group.column("page_json").to_pylist())
                      if p >= 0]          # sentinel page -> empty result
        return pa.table({
            "doc_id": group.column("doc_id").slice(0, 1),
            "json": pa.array(["[" + ",".join(pages_json) + "]"], pa.string()),
        })

    return (pages.map_batches(page_result, batch_format="pyarrow")
                 .groupby("doc_id")
                 .map_groups(doc_json, batch_format="pyarrow"))


def corpus_read_blocks(num_cpus: int, ms_per_page: float = 0.0) -> int:
    """Work-aware read-block rule for extraction (the ``sized_read_parquet``
    analog on the corpus path): the right block count follows PER-BLOCK WORK,
    not a fixed blocks-per-CPU ratio.

    - model-bound (``ms_per_page`` >= 1, i.e. real weights or the scaling
      bench's burn): 8 blocks/CPU — one task per block means the stage span
      is the slowest block, so fine blocks keep the straggler tail short
      (measured: 16 blocks on 16 CPUs = one 8-11 s wave, span == slowest).
    - sub-ms/page (pure-Python mocks): per-task fixed cost (~10 ms scheduling
      + sort-partition inheritance in the doc_id reassembly) dominates, and
      ONE block/CPU is optimal — measured on the 2x scaling corpus at
      16 CPUs: 128 blocks 3.9 s vs 16 blocks 2.6 s end-to-end (identical
      output), lifting unpadded N-vs-4N efficiency 0.51 -> ~0.77.

    At real scale the input file count dominates and this override is
    unnecessary; it matters when a small corpus is read as one splittable
    file set."""
    return num_cpus * (8 if ms_per_page >= 1.0 else 1)


def read_corpus(path: str, num_blocks: Optional[int] = None) -> "ray.data.Dataset":
    """Read an interleaved document table.  Lance is the production format
    (north rule); this sandbox has no lancedb wheel, so fall back to parquet
    transparently — the Dataset downstream is identical either way.
    Directories/files of ``.jsonl`` read through ``ray.data.read_json``
    with the rows cast onto DOC_SCHEMA (training-data corpora commonly
    interchange as JSON lines).

    ``num_blocks`` defaults to ONE block per CPU: with the current ~1.5
    ms/page map cost, per-block scheduling + sort-partition overhead
    dominates finer splits (measured at 32 CPUs, sf0.1: 32 blocks 2.4 s,
    128 blocks 3.9 s, 256 blocks 5.2 s).  Raise to 4-8 blocks/CPU when the
    per-page cost is model-bound (the scaling bench does: a straggler block
    then sets the stage span).  At real scale the file count dominates and
    the override is unnecessary."""
    import glob
    import os

    if num_blocks is None:
        num_blocks = int(ray.cluster_resources().get("CPU", 8))
    is_jsonl = path.endswith(".jsonl") or (
        os.path.isdir(path) and glob.glob(os.path.join(path, "*.jsonl")))
    if is_jsonl:
        import pyarrow as pa

        from ..schemas import DOC_SCHEMA

        def cast_schema(batch: "pa.Table") -> "pa.Table":
            # JSON inference yields int64 offsets / plain lists; pin the
            # declared schema so downstream stages see identical types
            return batch.select([f.name for f in DOC_SCHEMA]) \
                        .cast(DOC_SCHEMA)

        return ray.data.read_json(
            path, override_num_blocks=num_blocks,
            file_extensions=["jsonl"]).map_batches(
                cast_schema, batch_format="pyarrow")
    try:
        import lance  # noqa: F401
        return ray.data.read_lance(path)
    except ImportError:
        return ray.data.read_parquet(path, override_num_blocks=num_blocks)


def extraction_agreement(ds_a: "ray.data.Dataset",
                         ds_b: "ray.data.Dataset") -> "ray.data.Dataset":
    """Backend A/B evaluation over two flagship outputs: per-document
    span-SEQUENCE fingerprints (md5 over the ordered (kind, text,
    media_ref) tuples — exactly the north-rule equality surface) are
    compared doc-by-doc, and the report rolls up to ONE row:
    (n_docs, n_both, n_identical, agreement_rate, total_spans_a,
    total_spans_b).  The harness for "how much does switching the
    layout backend change the extraction?" — the reference answers this
    by eyeballing demo outputs; here it is a distributed measurement.

    Scale shape: each side maps to 40-byte (doc_id, fp, n_spans) rows —
    the spans never leave their extraction tasks — then ONE coarse
    doc-hash co-shuffle pairs the sides (union + per-bucket segment
    compare, the leakage_safe_split merge idiom) and ships one partial
    count row per bucket."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from ..functions.agg import _default_num_coarse

    nc = _default_num_coarse()

    def fp_fn(side: str):
        def fp(batch: pa.Table) -> pa.Table:
            col = batch.column("spans")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            offsets = col.offsets.to_numpy()
            flat = col.values
            span_str = pc.binary_join_element_wise(
                pc.fill_null(flat.field("kind"), ""),
                pc.fill_null(flat.field("text"), ""),
                pc.fill_null(flat.field("media_ref"), ""),
                "\x1f").to_pylist()
            fps, nsp = [], []
            for a, b in zip(offsets[:-1], offsets[1:]):
                h = hashlib.md5()
                for s in span_str[a:b]:
                    h.update(s.encode())
                    h.update(b"\x1e")
                fps.append(h.hexdigest())
                nsp.append(int(b - a))
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "fp": pa.array(fps, pa.string()),
                "n_spans": pa.array(nsp, pa.int64()),
                "side": pa.array([side] * batch.num_rows, pa.string())})
        return fp

    rows = ds_a.map_batches(fp_fn("a"), batch_format="pyarrow").union(
        ds_b.map_batches(fp_fn("b"), batch_format="pyarrow"))

    def tag(batch: pa.Table) -> pa.Table:
        from ..functions.agg import _coarse_of
        return batch.append_column(
            "__coarse", pa.array(
                _coarse_of(batch.column("doc_id"), nc), pa.int64()))

    def bucket(group: pa.Table) -> pa.Table:
        a = group.filter(pc.equal(group.column("side"), "a"))
        b = group.filter(pc.equal(group.column("side"), "b"))
        aid = np.asarray(a.column("doc_id").to_pylist(), dtype=object)
        bid = np.asarray(b.column("doc_id").to_pylist(), dtype=object)
        ao = np.argsort(aid)
        bo = np.argsort(bid)
        aid, bid = aid[ao], bid[bo]
        afp = np.asarray(a.column("fp").to_pylist(), dtype=object)[ao]
        bfp = np.asarray(b.column("fp").to_pylist(), dtype=object)[bo]
        pos = np.searchsorted(bid, aid)
        pos_ok = pos < len(bid)
        both = np.zeros(len(aid), dtype=bool)
        both[pos_ok] = bid[pos[pos_ok]] == aid[pos_ok]
        eq = both & (np.asarray(
            [bfp[p] if ok else "" for p, ok in zip(pos, both)],
            dtype=object) == afp)
        n_docs = len(np.union1d(aid, bid))
        return pa.table({
            "pn_docs": pa.array([n_docs], pa.int64()),
            "pn_both": pa.array([int(both.sum())], pa.int64()),
            "pn_eq": pa.array([int(eq.sum())], pa.int64()),
            "pn_sa": pa.array([int(pc.sum(a.column("n_spans")).as_py()
                                   or 0)], pa.int64()),
            "pn_sb": pa.array([int(pc.sum(b.column("n_spans")).as_py()
                                   or 0)], pa.int64())})

    from ray.data.aggregate import Sum

    agg = (rows.map_batches(tag, batch_format="pyarrow")
           .groupby("__coarse")
           .map_groups(bucket, batch_format="pyarrow")
           .aggregate(Sum("pn_docs", alias_name="n_docs"),
                      Sum("pn_both", alias_name="n_both"),
                      Sum("pn_eq", alias_name="n_identical"),
                      Sum("pn_sa", alias_name="total_spans_a"),
                      Sum("pn_sb", alias_name="total_spans_b")))

    from ..functions.num import round6
    nd = agg.get("n_docs") or 0
    return ray.data.from_arrow(pa.table({
        "n_docs": pa.array([nd], pa.int64()),
        "n_both": pa.array([agg.get("n_both") or 0], pa.int64()),
        "n_identical": pa.array([agg.get("n_identical") or 0], pa.int64()),
        "agreement_rate": round6(pa.array(
            [(agg.get("n_identical") or 0) / nd if nd else 0.0],
            pa.float64())),
        "total_spans_a": pa.array([agg.get("total_spans_a") or 0],
                                  pa.int64()),
        "total_spans_b": pa.array([agg.get("total_spans_b") or 0],
                                  pa.int64())}))
