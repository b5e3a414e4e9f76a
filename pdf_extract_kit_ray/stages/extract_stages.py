"""Ray Data stages of the flagship extraction pipeline.

Dataflow (SURVEY.md §3.2 restatement):

    docs ──explode──> pages ──Layout──> ──MFD──> ──MFR──> ──OCR──>
         ──assemble──> page spans ──groupby(doc_id)──> docs (ordered spans)

Every stage is a ``map_batches`` transform over Arrow batches.  The model
stages are callable classes so they run on **actor pools**
(``concurrency=N``): the backend is constructed once per actor in
``__init__`` (the weights-load analog) and only ``__call__`` runs per batch.
In this sandbox the backends are the deterministic mocks (mocks.py); the
stage plumbing — batch gather/scatter for MFR, per-region crop frames and
coordinate restores for OCR, explicit (page, det) keying instead of the
reference's positional zip — is the real engine.

Scale notes:
* The unit of parallelism is the PAGE (not the document), so multi-hundred
  page documents do not create stragglers (SURVEY.md §4.2 skew row).
* ``raw_dets`` is the page payload (the encoded-image analog); it is carried
  only as far as the OCR stage and projected out at assembly, so the
  reassembly shuffle moves only small span rows.
* The only all-to-all exchange is the final ``groupby(doc_id)``; ordering is
  carried by explicit ``(page_no, block_idx)`` keys, never by block order.
"""

from __future__ import annotations

from typing import Dict, List

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.assemble import page_spans_from_dets
from ..functions.geometry import quad_crop_to_page, quad_to_bbox
from ..functions.textnorm import latex_compact
from ..mocks import (
    OCR_CLASSES,
    TABLE_CLASSES,
    burn_compute,
    formula_crop_payload,
    mock_layout,
    mock_mfd,
    mock_mfr,
    mock_table,
    ocr_page_text_dets,
)
from ..schemas import (
    DET_TYPE,
    DOC_SCHEMA,
    PAGE_DETS_SCHEMA,
    PAGE_SCHEMA,
    PAGE_SPANS_SCHEMA,
    RAW_DET_TYPE,
    SPAN_TYPE,
)
from ..registry import STAGE_REGISTRY
from ..sources.corpus import (PAGE_H, PAGE_W, _PDF2IMAGE_SCALE,
                              split_pages_geom)


# ---------------------------------------------------------------------------
# doc -> page explode (stateless task)
# ---------------------------------------------------------------------------

@STAGE_REGISTRY.register("explode_pages")
def explode_pages(batch: pa.Table, backend: str = "fitz") -> pa.Table:
    """One doc row -> N page rows carrying the parsed page payload.  Page
    dims come from the per-page render geometry (S3: dpi-144 render with the
    >3000px dpi-72 downshift, corpus.render_geometry) — or, with
    ``backend="pdf2image"``, the S4 poppler variant's uniform 200-dpi
    upscale (pdf_extract_kit/utils/pdf_utils.py:3-5 renders at the
    pdf2image default 200 dpi with no size cap).

    Fully vectorized: the ``geom://`` encoding is parsed with ONE RE2 pass
    (pc.extract_regex) over the flat span arrays, page segmentation /
    render-geometry / the dpi-72 coordinate downshift are numpy over the
    same flat arrays, and the output list<struct> column is built directly
    from Arrow offsets — no per-span Python.  Semantics are pinned against
    the straight-line ``split_pages_geom`` twin (the oracle path) by
    byte-equality tests.

    Real-PDF seam: a batch carrying a ``pdf_bytes`` binary column (no
    ``spans``) routes to the import-gated PyMuPDF render path
    (sources/pdf_ingest.render_pdf_pages) — actual page rasters at dpi-144
    with the same >3000px dpi-72 re-render rule, emitted as one
    ``page_image`` det per page.  Raises ImportError when fitz is absent
    (this sandbox); the geom:// path is unaffected."""
    import numpy as np

    if ("pdf_bytes" in batch.column_names
            and "spans" not in batch.column_names):
        from ..sources.pdf_ingest import render_pdf_pages
        return render_pdf_pages(batch)

    empty = pa.Table.from_pydict(
        {n: [] for n in PAGE_SCHEMA.names}, schema=PAGE_SCHEMA)
    n_docs = batch.num_rows
    if n_docs == 0:
        return empty
    la = batch.column("spans").combine_chunks()
    abs_off = la.offsets.to_numpy().astype(np.int64)
    lo, hi = int(abs_off[0]), int(abs_off[-1])
    rel = abs_off - lo                       # per-doc span ranges, 0-based
    flat = la.values.slice(lo, hi - lo)
    n_spans = hi - lo

    doc_ids = batch.column("doc_id")
    spans_per_doc = np.diff(rel)

    if n_spans == 0:                         # every doc is zero-page
        sentinel_dets = pa.ListArray.from_arrays(
            pa.array(np.zeros(n_docs + 1, np.int32)),
            pa.array([], RAW_DET_TYPE))
        return pa.Table.from_arrays(
            [doc_ids, pa.array([-1] * n_docs, pa.int32()),
             pa.array([PAGE_W] * n_docs, pa.int32()),
             pa.array([PAGE_H] * n_docs, pa.int32()), sentinel_dets],
            schema=PAGE_SCHEMA)

    # one RE2 pass parses every geom:// payload (media prefix optional)
    g = pc.extract_regex(
        flat.field("media_ref"),
        r"^(?:(?P<m>[^|]*)\|)?geom://"
        r"(?P<x0>-?\d+),(?P<y0>-?\d+),(?P<x1>-?\d+),(?P<y1>-?\d+)"
        r"/(?P<s>-?[\d.]+)$")
    media = pc.fill_null(pc.struct_field(g, "m"), "")
    coords = [pc.cast(pc.struct_field(g, f), pa.int64()).to_numpy(
                  zero_copy_only=False)
              for f in ("x0", "y0", "x1", "y1")]
    score = pc.cast(pc.struct_field(g, "s"), pa.float64())

    # page segmentation: a page starts at offset==0 and at each doc's
    # first span (split_pages_geom's `offset == 0 or not pages`)
    off = flat.field("offset").to_numpy(zero_copy_only=False)
    page_start = off == 0
    page_start[rel[:-1][spans_per_doc > 0]] = True
    page_id = np.cumsum(page_start) - 1      # monotone over spans
    n_pages = int(page_id[-1]) + 1
    doc_of_span = np.repeat(np.arange(n_docs), spans_per_doc)
    doc_of_page = doc_of_span[page_start]

    # render geometry: the LAST page_geom row of a page wins (the
    # sequential `pages[-1].update` semantics); ascending assignment
    # reproduces that
    kind = flat.field("kind")
    is_pg = np.asarray(
        pc.equal(kind, "page_geom").to_numpy(zero_copy_only=False),
        dtype=bool)
    w_arr = np.full(n_pages, PAGE_W, np.int64)
    h_arr = np.full(n_pages, PAGE_H, np.int64)
    pg_pos = np.flatnonzero(is_pg)
    w_arr[page_id[pg_pos]] = coords[2][pg_pos]
    h_arr[page_id[pg_pos]] = coords[3][pg_pos]
    # per-page scale: applied only to pages that CARRY a page_geom row
    # (split_pages_geom calls render_geometry only then; default pages
    # keep scale 1.0 and the A4 dpi-144 dims under every backend)
    page_scale = np.ones(n_pages, np.float64)
    if backend == "pdf2image":
        has_pg = np.zeros(n_pages, bool)
        has_pg[page_id[pg_pos]] = True
        page_scale[has_pg] = _PDF2IMAGE_SCALE
        w_arr = np.where(has_pg, np.trunc(w_arr * _PDF2IMAGE_SCALE),
                         w_arr).astype(np.int64)
        h_arr = np.where(has_pg, np.trunc(h_arr * _PDF2IMAGE_SCALE),
                         h_arr).astype(np.int64)
    elif backend == "fitz":
        big = (w_arr > 3000) | (h_arr > 3000)
        page_scale[big] = 0.5
        w_arr = np.where(big, w_arr // 2, w_arr)
        h_arr = np.where(big, h_arr // 2, h_arr)
    else:
        raise ValueError(f"unknown render backend: {backend!r}")

    # element rows (page_geom pseudo-spans dropped), coordinate rescale
    # int-truncated exactly like corpus._scale_els (int() truncates toward
    # zero; np.trunc matches for negatives where // would not)
    keep = ~is_pg
    el_scale = page_scale[page_id]
    rescale = (el_scale != 1.0) & keep
    xy = []
    for c in coords:
        scaled = np.where(rescale, np.trunc(c * el_scale), c)
        xy.append(pa.array(scaled.astype(np.int32), pa.int32()))
    keep_idx = np.flatnonzero(keep)
    keep_i = pa.array(keep_idx, pa.int64())
    struct = pa.StructArray.from_arrays(
        [kind.take(keep_i),
         xy[0].take(keep_i), xy[1].take(keep_i),
         xy[2].take(keep_i), xy[3].take(keep_i),
         score.take(keep_i), flat.field("text").take(keep_i),
         media.take(keep_i)],
        names=[f.name for f in RAW_DET_TYPE])

    # splice sentinel pages for zero-span docs, in (doc, page_no) order
    pages_per_doc = np.bincount(doc_of_page, minlength=n_docs)
    is_empty_doc = pages_per_doc == 0
    out_per_doc = np.where(is_empty_doc, 1, pages_per_doc)
    n_out = int(out_per_doc.sum())
    sentinel = np.repeat(is_empty_doc, out_per_doc)
    real = ~sentinel

    first_page_of_doc = np.concatenate(
        [[0], np.cumsum(pages_per_doc)[:-1]])
    page_no_real = np.arange(n_pages) - first_page_of_doc[doc_of_page]
    page_no = np.full(n_out, -1, np.int64)
    page_no[real] = page_no_real
    w_out = np.full(n_out, PAGE_W, np.int64)
    h_out = np.full(n_out, PAGE_H, np.int64)
    w_out[real], h_out[real] = w_arr, h_arr

    els_per_page = np.bincount(page_id[keep], minlength=n_pages)
    len_out = np.zeros(n_out, np.int64)
    len_out[real] = els_per_page
    offsets = np.concatenate([[0], np.cumsum(len_out)]).astype(np.int32)
    raw_dets = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)

    out_doc = doc_ids.take(
        pa.array(np.repeat(np.arange(n_docs), out_per_doc), pa.int64()))
    return pa.Table.from_arrays(
        [out_doc, pa.array(page_no.astype(np.int32), pa.int32()),
         pa.array(w_out.astype(np.int32), pa.int32()),
         pa.array(h_out.astype(np.int32), pa.int32()), raw_dets],
        schema=PAGE_SCHEMA)


def _pages_out(batch_cols: dict, dets_lists: List[List[dict]]) -> pa.Table:
    cols = dict(batch_cols)
    cols["dets"] = dets_lists
    return pa.Table.from_pydict(cols, schema=PAGE_DETS_SCHEMA)


def _structlist_to_dicts(col: "pa.ChunkedArray") -> List[List[dict]]:
    """list<struct> column -> per-row dict lists, via field-wise flat
    conversion (2x faster than the nested ``to_pylist``: each leaf array
    converts in one C pass instead of per-struct)."""
    la = col.combine_chunks()
    offsets = la.offsets.to_numpy()
    flat = la.values
    names = [f.name for f in flat.type]
    field_cols = [flat.field(n).to_pylist() for n in names]
    rows = [dict(zip(names, v)) for v in zip(*field_cols)]
    return [rows[offsets[i]:offsets[i + 1]] for i in range(len(offsets) - 1)]


def _batch_pages(batch: pa.Table):
    cols = {}
    for name in batch.column_names:
        col = batch.column(name)
        if pa.types.is_list(col.type) and pa.types.is_struct(col.type.value_type):
            cols[name] = _structlist_to_dicts(col)
        else:
            cols[name] = col.to_pylist()
    return cols


# ---------------------------------------------------------------------------
# model stages (actor pools)
# ---------------------------------------------------------------------------

@STAGE_REGISTRY.register("layout")
class LayoutStage:
    """Layout detector (M1/M2 analog).  Emits the page's block detections.
    Backend loaded once per actor; pluggable (mock in sandbox)."""

    def __init__(self, backend: str = "mock",
                 emulate_inference_ms: float = 0.0,
                 backend_options: dict = None):
        from ..mocks import LAYOUT_BACKENDS
        if backend in LAYOUT_BACKENDS:
            self._detect = LAYOUT_BACKENDS[backend]
        else:
            # real-weights seam (stages/model_adapters.py): loads once per
            # actor here; raises ImportError without the real libs
            from .model_adapters import build_backend
            self._detect = build_backend("layout", backend,
                                         **(backend_options or {}))
        self._emulate = 0.3 * emulate_inference_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = _batch_pages(batch)
        dets = []
        for page in cols["raw_dets"]:
            burn_compute(self._emulate)
            dets.append(self._detect(page))
        return _pages_out(cols, dets)


@STAGE_REGISTRY.register("mfd")
class MFDStage:
    """Formula detector (M3 analog): appends inline/isolated detections with
    empty LaTeX, AFTER the layout detections (stage order is part of the
    span-pool order contract, SURVEY.md §2.4 G1)."""

    def __init__(self, backend: str = "mock",
                 emulate_inference_ms: float = 0.0,
                 backend_options: dict = None):
        if backend == "mock":
            self._detect = mock_mfd
        else:
            from .model_adapters import build_backend
            self._detect = build_backend("mfd", backend,
                                         **(backend_options or {}))
        self._emulate = 0.1 * emulate_inference_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = _batch_pages(batch)
        # standalone formula-detection chains (run_task.py, matching the
        # reference's scripts/formula_detection.py single-task mode) feed
        # pages with no prior layout dets — start each pool empty then
        prior = cols.get("dets") or [[] for _ in cols["raw_dets"]]
        dets = []
        for page, page_dets in zip(cols["raw_dets"], prior):
            burn_compute(self._emulate)
            dets.append(list(page_dets) + self._detect(page))
        return _pages_out(cols, dets)


@STAGE_REGISTRY.register("mfr")
class MFRStage:
    """Formula recognizer (M4 analog).

    Gathers every formula crop across the batch's pages into one inference
    batch (the reference's cross-page batch-128 optimization,
    pdf2markdown.py:176-190) and scatters the normalized LaTeX back by
    explicit (page_index, det_index) key — the shuffle-safe replacement for
    the reference's positional zip over aliased dicts (the #1 semantics trap
    of distribution, SURVEY.md §2.4 G2)."""

    def __init__(self, backend: str = "mock",
                 emulate_inference_ms: float = 0.0,
                 backend_options: dict = None):
        if backend == "mock":
            self._recognize = mock_mfr
        else:
            from .model_adapters import build_backend
            self._recognize = build_backend("mfr", backend,
                                            **(backend_options or {}))
        self._emulate = 0.2 * emulate_inference_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        burn_compute(self._emulate * max(1, batch.num_rows))
        cols = _batch_pages(batch)
        needs_image = getattr(self._recognize, "needs_image", False)
        keys, payloads = [], []
        for p_idx, (page, dets) in enumerate(zip(cols["raw_dets"], cols["dets"])):
            page_img = None
            if needs_image:
                from .model_adapters import (crop_image,
                                             page_image_from_raw_dets)
                page_img = page_image_from_raw_dets(page)
            for d_idx, det in enumerate(dets):
                if det["kind"] in ("inline", "isolated"):
                    keys.append((p_idx, d_idx))
                    crop = (crop_image(page_img, det) if needs_image
                            else formula_crop_payload(page, det))
                    payloads.append((crop, det))
        # one batched inference call over all crops (real adapters expose
        # recognize_batch — true torch batching in 128-crop chunks)
        if hasattr(self._recognize, "recognize_batch"):
            latexes = [latex_compact(t) for t in
                       self._recognize.recognize_batch(
                           [p for p, _ in payloads])]
        else:
            latexes = [latex_compact(self._recognize(payload, det))
                       for payload, det in payloads]
        for (p_idx, d_idx), latex in zip(keys, latexes):
            cols["dets"][p_idx][d_idx] = dict(cols["dets"][p_idx][d_idx],
                                              text=latex)
        return _pages_out({k: cols[k] for k in
                           ("doc_id", "page_no", "width", "height", "raw_dets")},
                          cols["dets"])


@STAGE_REGISTRY.register("ocr")
class OCRStage:
    """OCR (M5 analog): per OCR-class region, build the padded crop frame,
    adjust formula boxes into it, run det→merge→mask→rec, restore coordinates
    to the page frame, append text detections in region order."""

    def __init__(self, backend: str = "mock", drop_score: float = 0.5,
                 emulate_inference_ms: float = 0.0,
                 backend_options: dict = None):
        if backend == "mock":
            self._ocr = ocr_page_text_dets
        else:
            from .model_adapters import build_backend
            self._ocr = build_backend("ocr", backend,
                                      **(backend_options or {}))
        self.drop_score = drop_score
        self._emulate = 0.4 * emulate_inference_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = _batch_pages(batch)
        out_dets = []
        for page, dets in zip(cols["raw_dets"], cols["dets"]):
            burn_compute(self._emulate)
            dets = list(dets)
            dets.extend(self._ocr(page, dets, drop_score=self.drop_score))
            out_dets.append(dets)
        return _pages_out(cols, out_dets)


@STAGE_REGISTRY.register("table")
class TableStage:
    """Table parser (M6 analog): parses table-region crops to HTML source on
    an actor pool, with the reference's ``max_time`` straggler cap re-expressed
    as a per-row cutoff (a payload flagged over-cap yields an empty result and
    a counted metric instead of stalling the stage).  Output is a side column;
    table text does not enter the golden span sequence (the reference's md
    emitter skips tables)."""

    def __init__(self, backend: str = "mock", max_elements: int = 10_000,
                 backend_options: dict = None):
        if backend == "mock":
            self._parse = mock_table
        else:
            from .model_adapters import build_backend
            self._parse = build_backend("table", backend,
                                        **(backend_options or {}))
        self.max_elements = max_elements
        self.timeouts = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = _batch_pages(batch)
        needs_image = getattr(self._parse, "needs_image", False)
        tables = []
        for page, dets in zip(cols["raw_dets"], cols["dets"]):
            page_tables = []
            page_img = None
            if needs_image and any(d["kind"] in TABLE_CLASSES
                                   for d in dets):
                from .model_adapters import (crop_image,
                                             page_image_from_raw_dets)
                page_img = page_image_from_raw_dets(page)
            for det in dets:
                if det["kind"] not in TABLE_CLASSES:
                    continue
                payload = (crop_image(page_img, det) if needs_image
                           else formula_crop_payload(page, det))
                # the element cap pre-filters geometry payloads; real
                # backends carry their own max_time cap inside the model
                # (struct_eqtable build_model(max_time=30))
                over_cap = (not needs_image
                            and len(payload) > self.max_elements)
                if over_cap:
                    self.timeouts += 1
                page_tables.append(self._parse(payload, det,
                                               max_time_exceeded=over_cap))
            tables.append(page_tables)
        out = _batch_pages(batch)
        table = _pages_out(out, cols["dets"])
        return table.append_column("table_sources",
                                   pa.array(tables, type=pa.list_(pa.string())))


@STAGE_REGISTRY.register("fused_extract")
class FusedExtractStage:
    """All model stages + assembly fused into ONE actor pass per page batch.

    The split pools (LayoutStage..OCRStage) are the deployment shape when
    stages need heterogeneous resources (separate GPU pools, independent
    sizing).  When every backend shares the same resource — all-CPU mocks
    here, or a single-GPU-class cluster — the per-stage Arrow<->Python
    round-trips of the page payload dominate, and fusing removes four of the
    five conversions while keeping semantics identical (the e2e test pins
    fused == split == oracle).  MFR still batches crops across all pages of
    the batch (the reference's cross-page batch-128 analog)."""

    def __init__(self, backend: str = "mock", drop_score: float = 0.5,
                 emulate_inference_ms: float = 0.0,
                 reading_order: str = "reference"):
        from ..mocks import LAYOUT_BACKENDS
        if backend not in LAYOUT_BACKENDS:
            raise NotImplementedError(
                "real layout backends (DocLayout-YOLO / LayoutLMv3) need GPU "
                "weights not present in this sandbox; available mocks: "
                + ", ".join(sorted(LAYOUT_BACKENDS)))
        self._layout = LAYOUT_BACKENDS[backend]
        self.drop_score = drop_score
        self.emulate_inference_ms = emulate_inference_ms
        self.reading_order = reading_order

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = _batch_pages(batch)
        pages = cols["raw_dets"]
        all_dets: List[List[dict]] = []

        # layout + MFD per page; gather formula crops batch-wide
        keys, payloads = [], []
        for p_idx, page in enumerate(pages):
            burn_compute(self.emulate_inference_ms)
            dets = self._layout(page)
            for det in mock_mfd(page):
                dets.append(det)
                keys.append((p_idx, len(dets) - 1))
                payloads.append((formula_crop_payload(page, det), det))
            all_dets.append(dets)

        # one batched MFR inference over every crop in the batch
        for (p_idx, d_idx), (payload, det) in zip(keys, payloads):
            all_dets[p_idx][d_idx] = dict(
                all_dets[p_idx][d_idx],
                text=latex_compact(mock_mfr(payload, det)))

        # OCR per region (page-level visibility broadcast), then assembly,
        # straight to span rows
        out = {"doc_id": [], "page_no": [], "block_idx": [],
               "kind": [], "text": [], "media_ref": []}
        for p_idx, page in enumerate(pages):
            if cols["page_no"][p_idx] == -1:
                _emit_doc_marker(out, cols["doc_id"][p_idx])
                continue
            dets = all_dets[p_idx]
            dets.extend(ocr_page_text_dets(page, dets,
                                           drop_score=self.drop_score))
            page_spans = page_spans_from_dets(dets, self.reading_order,
                                              cols["width"][p_idx])
            if not page_spans:
                _emit_page_marker(out, cols["doc_id"][p_idx],
                                  cols["page_no"][p_idx])
            for block_idx, span in enumerate(page_spans):
                out["doc_id"].append(cols["doc_id"][p_idx])
                out["page_no"].append(cols["page_no"][p_idx])
                out["block_idx"].append(block_idx)
                out["kind"].append(span["kind"])
                out["text"].append(span["text"])
                out["media_ref"].append(span["media_ref"])
        return pa.Table.from_pydict(out, schema=PAGE_SPANS_SCHEMA)


def fused_dets_batch(batch: pa.Table, backend: str = "mock",
                     drop_score: float = 0.5) -> pa.Table:
    """The fused model chain (layout + MFD + batched MFR + OCR) emitting the
    per-page DETECTION table (PAGE_DETS_SCHEMA) instead of assembled span
    rows — one task pass, no per-stage pools.  Feeds det-level projections
    (the reference-JSON sink) at fused-path cost."""
    from ..mocks import LAYOUT_BACKENDS
    cols = _batch_pages(batch)
    pages = cols["raw_dets"]
    layout = LAYOUT_BACKENDS[backend]
    all_dets: List[List[dict]] = []
    keys, payloads = [], []
    for p_idx, page in enumerate(pages):
        dets = layout(page)
        for det in mock_mfd(page):
            dets.append(det)
            keys.append((p_idx, len(dets) - 1))
            payloads.append((formula_crop_payload(page, det), det))
        all_dets.append(dets)
    for (p_idx, d_idx), (payload, det) in zip(keys, payloads):
        all_dets[p_idx][d_idx] = dict(
            all_dets[p_idx][d_idx],
            text=latex_compact(mock_mfr(payload, det)))
    for p_idx, page in enumerate(pages):
        all_dets[p_idx].extend(ocr_page_text_dets(page, all_dets[p_idx],
                                                  drop_score=drop_score))
    return _pages_out(cols, all_dets)


_TABLE_CACHE: Dict[tuple, tuple] = {}


def fused_table_batch(batch: pa.Table, backend: str = "mock") -> pa.Table:
    """Layout + table parse chained in one stateless task pass (the mocks
    hold no state, so no actor pools to spin up; per-process instances are
    cached like fused_extract_batch)."""
    pair = _TABLE_CACHE.get((backend,))
    if pair is None:
        pair = _TABLE_CACHE[(backend,)] = (LayoutStage(backend=backend),
                                           TableStage())
    layout, table = pair
    return table(layout(batch))


_FUSED_CACHE: Dict[tuple, "FusedExtractStage"] = {}


def fused_extract_batch(batch: pa.Table, backend: str = "mock",
                        drop_score: float = 0.5,
                        emulate_inference_ms: float = 0.0,
                        reading_order: str = "reference") -> pa.Table:
    """Task-mode wrapper for FusedExtractStage: the mock backends are
    stateless, so plain tasks (which reuse warm worker processes and let the
    executor use every CPU) are the idiomatic shape in the sandbox; actor
    pools remain the shape for weights-loading backends."""
    key = (backend, drop_score, emulate_inference_ms, reading_order)
    stage = _FUSED_CACHE.get(key)
    if stage is None:
        stage = _FUSED_CACHE[key] = FusedExtractStage(
            backend=backend, drop_score=drop_score,
            emulate_inference_ms=emulate_inference_ms,
            reading_order=reading_order)
    return stage(batch)


# ---------------------------------------------------------------------------
# assembly (stateless) + document reassembly (the one shuffle)
# ---------------------------------------------------------------------------

@STAGE_REGISTRY.register("assemble")
def assemble_page_spans(batch: pa.Table,
                        reading_order: str = "reference") -> pa.Table:
    """Per-page ordered span records; projects out the page payload so the
    doc_id shuffle moves only small rows."""
    cols = _batch_pages(batch)
    out = {"doc_id": [], "page_no": [], "block_idx": [],
           "kind": [], "text": [], "media_ref": []}
    for doc_id, page_no, width, dets in zip(cols["doc_id"], cols["page_no"],
                                            cols["width"], cols["dets"]):
        if page_no == -1:
            _emit_doc_marker(out, doc_id)
            continue
        page_spans = page_spans_from_dets(dets, reading_order, width)
        if not page_spans:
            _emit_page_marker(out, doc_id, page_no)
        for block_idx, span in enumerate(page_spans):
            out["doc_id"].append(doc_id)
            out["page_no"].append(page_no)
            out["block_idx"].append(block_idx)
            out["kind"].append(span["kind"])
            out["text"].append(span["text"])
            out["media_ref"].append(span["media_ref"])
    return pa.Table.from_pydict(out, schema=PAGE_SPANS_SCHEMA)


def _emit_doc_marker(out: dict, doc_id) -> None:
    """Sentinel span row for a zero-page doc (filtered out at reassembly,
    keeps the doc_id group alive across the shuffle)."""
    out["doc_id"].append(doc_id)
    out["page_no"].append(-1)
    out["block_idx"].append(-1)
    out["kind"].append("__doc__")
    out["text"].append("")
    out["media_ref"].append("")


def _emit_page_marker(out: dict, doc_id, page_no: int) -> None:
    """Sentinel row for a page that emitted ZERO spans (blank or
    abandon-only page): reassembly drops it (block_idx < 0), but the
    markdown projection needs the page to exist so its '' page joins into
    the document exactly like the oracle's per-page emission."""
    out["doc_id"].append(doc_id)
    out["page_no"].append(page_no)
    out["block_idx"].append(-1)
    out["kind"].append("__page__")
    out["text"].append("")
    out["media_ref"].append("")


_CHUNK_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("salt", pa.int32()),
    ("kinds", pa.list_(pa.string())),
    ("texts", pa.list_(pa.string())),
    ("media_refs", pa.list_(pa.string())),
])


def add_salt(batch: pa.Table, salt_pages: int) -> pa.Table:
    """Salt the reassembly key: page ranges of ``salt_pages`` pages share a
    salt, so a many-thousand-page whale doc's span rows spread over many groups in
    the first shuffle instead of converging into one worker's heap."""
    import numpy as np
    page_no = batch.column("page_no").to_numpy()
    salt = np.maximum(page_no, 0) // salt_pages
    return batch.append_column("salt", pa.array(salt, pa.int32()))


def reassemble_chunk(group: pa.Table) -> pa.Table:
    """Phase 1 of salted reassembly: one (doc_id, salt) group -> ONE chunk
    row holding that page range's ordered span columns.  Sentinel rows
    (zero-page docs) become an empty chunk, keeping the doc alive."""
    doc_id = group.column("doc_id")[0].as_py()
    salt = group.column("salt")[0].as_py()
    group = group.filter(pc.greater_equal(group.column("block_idx"), 0))
    group = group.sort_by([("page_no", "ascending"), ("block_idx", "ascending")])
    n = group.num_rows
    offsets = pa.array([0, n], pa.int32())

    def as_list(col: str) -> pa.Array:
        return pa.ListArray.from_arrays(offsets,
                                        group.column(col).combine_chunks())

    return pa.Table.from_arrays(
        [pa.array([doc_id], pa.string()), pa.array([salt], pa.int32()),
         as_list("kind"), as_list("text"), as_list("media_ref")],
        schema=_CHUNK_SCHEMA)


def merge_doc_chunks(group: pa.Table) -> pa.Table:
    """Phase 2 of salted reassembly: concatenate a doc's chunk rows in salt
    order (salt = page range order) and assign dense global offsets.

    The group holds one ROW per page range, not per span — salting wins on
    phase-1 shuffle/sort row counts (span rows spread over many groups) —
    but the doc's full span DATA still converges here, packed inside the
    chunk rows: the one-row-per-doc output contract makes that peak
    per-group byte size inherent to any reassembly, salted or not."""
    import numpy as np
    doc_id = group.column("doc_id")[0].as_py()
    group = group.sort_by([("salt", "ascending")])
    # list_flatten concatenates in row (= salt) order: the chunk columns
    # become the doc's span columns with no per-span Python
    kinds = pc.list_flatten(group.column("kinds").combine_chunks())
    texts = pc.list_flatten(group.column("texts").combine_chunks())
    medias = pc.list_flatten(group.column("media_refs").combine_chunks())
    n = len(kinds)
    st = pa.StructArray.from_arrays(
        [kinds, texts, medias,
         pa.array(np.arange(n, dtype=np.int32), pa.int32())],
        names=["kind", "text", "media_ref", "offset"])
    spans = pa.ListArray.from_arrays(pa.array([0, n], pa.int32()), st)
    return pa.Table.from_arrays([pa.array([doc_id], pa.string()), spans],
                                schema=DOC_SCHEMA)


def _spans_list_column(group: pa.Table) -> pa.Array:
    """One-row list<SPAN_TYPE> column from a sorted span-row group, built
    directly on the Arrow arrays (no per-span Python dicts): the kind/text/
    media_ref columns are reused zero-copy, offsets are a dense arange."""
    import numpy as np
    n = group.num_rows
    st = pa.StructArray.from_arrays(
        [group.column("kind").combine_chunks(),
         group.column("text").combine_chunks(),
         group.column("media_ref").combine_chunks(),
         pa.array(np.arange(n, dtype=np.int32), pa.int32())],
        names=["kind", "text", "media_ref", "offset"])
    return pa.ListArray.from_arrays(pa.array([0, n], pa.int32()), st)


def reassemble_document(group: pa.Table) -> pa.Table:
    """groupby(doc_id) group -> one doc row: sort rows by the explicit
    (page_no, block_idx) key and assign dense global offsets.  Sentinel
    rows (block_idx == -1, zero-page docs) keep the doc in the output with
    an empty span list."""
    doc_id = group.column("doc_id")[0].as_py()
    group = group.filter(pc.greater_equal(group.column("block_idx"), 0))
    group = group.sort_by([("page_no", "ascending"), ("block_idx", "ascending")])
    return pa.Table.from_arrays(
        [pa.array([doc_id], pa.string()), _spans_list_column(group)],
        schema=DOC_SCHEMA)


def add_reassembly_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Coarse reassembly key: hash(doc_id) % num_buckets, vectorized off
    the Arrow string buffers.  Equal doc_ids always co-bucket (the only
    requirement); the in-bucket lexsort separates bucketmates."""
    from ..pipelines.dedup import _string_coarse_hash
    ids = batch.column("doc_id")
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    b = _string_coarse_hash(ids, num_buckets)
    return batch.append_column("__bucket", pa.array(b, pa.int64()))


def reassemble_bucket(group: pa.Table) -> pa.Table:
    """All docs of one coarse bucket, reassembled VECTORIZED: one lexsort
    by (doc_id, page_no, block_idx), run-length doc boundaries, dense
    per-doc offsets via numpy, a single ListArray build — the per-doc
    ``map_groups`` dispatch of ``reassemble_document`` (a per-key Python
    call per document — the CLAUDE.md anti-pattern, and ~40% of the
    unpadded flagship's critical path at 8k docs) amortized over the
    bucket.  Per-doc bytes are IDENTICAL: within a doc the
    (page_no, block_idx) key is unique, so the lexsort induces the same
    total order ``reassemble_document``'s per-group sort does."""
    import numpy as np
    if group.num_rows == 0:
        return DOC_SCHEMA.empty_table()
    g = group.sort_by([("doc_id", "ascending"), ("page_no", "ascending"),
                       ("block_idx", "ascending")])
    ids = g.column("doc_id").combine_chunks()
    n = len(ids)
    if n > 1:
        neq = pc.not_equal(ids.slice(1, n - 1), ids.slice(0, n - 1))
        starts = np.r_[0, np.flatnonzero(
            neq.to_numpy(zero_copy_only=False)) + 1]
    else:
        starts = np.array([0], dtype=np.int64)
    bounds = np.r_[starts, n]
    keep = g.column("block_idx").to_numpy() >= 0
    kept_prefix = np.r_[0, np.cumsum(keep)]
    offsets = kept_prefix[bounds]               # kept rows per doc, cumulative
    kept = g.filter(pa.array(keep))
    total_kept = int(offsets[-1])
    within = np.arange(total_kept, dtype=np.int64) - \
        np.repeat(offsets[:-1], np.diff(offsets))
    st = pa.StructArray.from_arrays(
        [kept.column("kind").combine_chunks(),
         kept.column("text").combine_chunks(),
         kept.column("media_ref").combine_chunks(),
         pa.array(within.astype(np.int32), pa.int32())],
        names=["kind", "text", "media_ref", "offset"])
    spans = pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32), pa.int32()), st)
    return pa.Table.from_arrays([ids.take(starts), spans],
                                schema=DOC_SCHEMA)
