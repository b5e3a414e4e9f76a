"""Mergeable sketches for approximate aggregates at 100 TB scale.

Exact distinct/quantile need a full shuffle of the key stream; these sketches
reduce each block to a few KB inside ``map_batches`` and merge
associatively, so the wide step moves kilobytes per block no matter how many
rows the input has.

* **HyperLogLog** (Flajolet et al. 2007): p-bit register index, max
  leading-zero rank per register; standard bias-corrected estimate with
  linear-counting small-range correction.
* **DDSketch** (Masson et al., VLDB 2019): logarithmic bins with relative
  accuracy alpha — bin = ceil(log_gamma(v)), gamma = (1+a)/(1-a); quantile
  of the merged bin histogram is within a*v of the true value.  Implemented
  here as (bin -> count) dict partials (sparse; zero/negative values tracked
  in a dedicated underflow bin).
* **Misra-Gries** heavy hitters (Misra & Gries 1982; merge rule from
  Agarwal et al., "Mergeable Summaries", PODS 2012): at most k counters;
  merge sums counters pointwise then subtracts the (k+1)-th largest count
  from every counter, dropping non-positive ones.  Any key with true
  frequency > n/(k+1) is guaranteed to survive, and every reported count
  undercounts by at most the tracked ``err`` (<= n/(k+1)).  When the
  true distinct-key count never exceeds k the summary is LOSSLESS
  (err stays 0 and counts are exact).

All are deterministic: hashing is splitmix64, never Python ``hash()``.
"""

from __future__ import annotations

import math
from typing import Dict, Iterable, Tuple

import numpy as np


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: uint64 -> well-mixed uint64."""
    x = x.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

class HLL:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        # shift the index bits out and pad with ones so the scan below
        # naturally caps the rank at (64-p)+1 when the suffix is all zeros
        v = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the suffix + 1, via a vectorized bit scan
        # (float-exponent tricks mis-rank when the mantissa rounds up)
        ranks = np.zeros(len(h), dtype=np.uint8)
        mask = np.ones(len(h), dtype=bool)
        for r in range(1, 64 - self.p + 2):
            top = (v >> np.uint64(63)).astype(bool)
            ranks[mask & top] = r
            mask &= ~top
            if not mask.any():
                break
            v = v << np.uint64(1)
        np.maximum.at(self.registers, idx, ranks)

    def add_ints(self, values: np.ndarray) -> None:
        self.add_hashes(splitmix64(values.astype(np.uint64)))

    def merge_registers(self, regs: np.ndarray) -> None:
        np.maximum(self.registers, regs, out=self.registers)

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        # register-reciprocal sum computed EXACTLY in integer units of
        # 2^-64 (S = sum over registers of 2^(64-r), a Python bigint) so
        # the only float roundings are the final cast + one division —
        # a fixed op tree any engine (e.g. the DuckDB twin) reproduces
        # bit-for-bit, unlike a float accumulation whose value depends
        # on summation order.
        counts = np.bincount(self.registers, minlength=65)
        S = sum(int(c) << (64 - r)
                for r, c in enumerate(counts.tolist()) if c)
        est = alpha * m * m * 2.0 ** 64 / float(S)
        zeros = int(counts[0])
        if est <= 2.5 * m and zeros:
            est = m * math.log(m / zeros)       # linear counting
        return float(est)


# ---------------------------------------------------------------------------
# DDSketch
# ---------------------------------------------------------------------------

class DDSketch:
    def __init__(self, alpha: float = 0.01):
        self.alpha = alpha
        self.gamma = (1 + alpha) / (1 - alpha)
        self._log_gamma = math.log(self.gamma)
        self.bins: Dict[int, int] = {}
        self.n_underflow = 0   # values <= 0 (sketch is for positive reals)

    def add(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        pos = values[values > 0]
        self.n_underflow += int(len(values) - len(pos))
        if len(pos) == 0:
            return
        keys = np.ceil(np.log(pos) / self._log_gamma).astype(np.int64)
        uniq, counts = np.unique(keys, return_counts=True)
        for k, c in zip(uniq.tolist(), counts.tolist()):
            self.bins[k] = self.bins.get(k, 0) + int(c)

    def merge(self, other_bins: Dict[int, int], other_underflow: int = 0) -> None:
        for k, c in other_bins.items():
            self.bins[int(k)] = self.bins.get(int(k), 0) + int(c)
        self.n_underflow += other_underflow

    @property
    def count(self) -> int:
        return self.n_underflow + sum(self.bins.values())

    def quantile(self, q: float) -> float:
        """Value whose rank is ceil(q*n) (percentile_disc-shaped), accurate
        to relative error alpha.  Underflow (<=0) values all report 0.0."""
        n = self.count
        if n == 0:
            return float("nan")
        target = max(1, math.ceil(q * n))
        if target <= self.n_underflow:
            return 0.0
        running = self.n_underflow
        for k in sorted(self.bins):
            running += self.bins[k]
            if running >= target:
                # midpoint of bin k: gamma^k * 2/(gamma+1) is the canonical
                # bias-centered representative
                return float(self.gamma ** k * 2 / (self.gamma + 1))
        return float(self.gamma ** max(self.bins) * 2 / (self.gamma + 1))


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------

class MisraGries:
    """Mergeable k-counter heavy-hitters summary over int64 keys.

    ``counters[key]`` undercounts the key's true frequency by at most
    ``err``; keys with true frequency > n/(k+1) are guaranteed present
    (the classic epsilon = 1/(k+1) deterministic guarantee, preserved
    under the PODS'12 merge rule below)."""

    def __init__(self, k: int):
        self.k = k
        self.counters: Dict[int, int] = {}
        self.err = 0

    def add_block(self, values: np.ndarray) -> None:
        """Fold a block's exact histogram in (an exact histogram is itself
        an MG summary with err 0, so this is just a merge)."""
        uniq, counts = np.unique(values.astype(np.int64), return_counts=True)
        for key, c in zip(uniq.tolist(), counts.tolist()):
            self.counters[key] = self.counters.get(key, 0) + c
        self._shrink()

    def merge(self, other: "MisraGries") -> None:
        for key, c in other.counters.items():
            self.counters[key] = self.counters.get(key, 0) + c
        self.err += other.err
        self._shrink()

    def _shrink(self) -> None:
        if len(self.counters) <= self.k:
            return
        counts = np.fromiter(self.counters.values(), dtype=np.int64,
                             count=len(self.counters))
        # the (k+1)-th largest counter value
        thresh = int(np.partition(counts, -(self.k + 1))[-(self.k + 1)])
        self.err += thresh
        self.counters = {key: c - thresh
                         for key, c in self.counters.items() if c > thresh}

    def top(self, n: int) -> list:
        """Top-n (key, estimate) by (estimate desc, key asc) — the
        deterministic tie-break shared with the SQL twin."""
        items = sorted(self.counters.items(), key=lambda kv: (-kv[1], kv[0]))
        return items[:n]


def make_mg_aggregator(on: str, k: int = 1024, name: str = None):
    """Misra-Gries heavy hitters as an ``AggregateFnV2``: the accumulator is
    the packed int64 summary (err, keys..., counts...), combine is the
    mergeable-summaries merge, finalize emits the flattened
    ``[err, key1, count1, key2, count2, ...]`` list (unpack downstream).
    Like the HLL/DDSketch aggregators, partials are a few KB per block and
    merge inside the aggregation tree — no driver-side merge, no shuffle of
    the key stream."""
    from ray.data.aggregate import AggregateFnV2

    def _pack(sk: MisraGries) -> bytes:
        keys = np.fromiter(sk.counters.keys(), dtype=np.int64,
                           count=len(sk.counters))
        counts = np.fromiter(sk.counters.values(), dtype=np.int64,
                             count=len(sk.counters))
        return np.concatenate(([sk.err], keys, counts)).tobytes()

    def _unpack(acc: bytes) -> MisraGries:
        sk = MisraGries(k)
        if not acc:
            return sk
        arr = np.frombuffer(acc, np.int64)
        m = (len(arr) - 1) // 2
        sk.counters = dict(zip(arr[1:1 + m].tolist(), arr[1 + m:].tolist()))
        sk.err = int(arr[0])
        return sk

    class HeavyHitters(AggregateFnV2):
        def __init__(self):
            super().__init__(name or f"heavy_hitters({on})",
                             zero_factory=lambda: b"",
                             on=on, ignore_nulls=True)

        def aggregate_block(self, block) -> bytes:
            sk = MisraGries(k)
            col = block.column(on) if hasattr(block, "column") else block[on]
            sk.add_block(np.asarray(
                col.to_numpy() if hasattr(col, "to_numpy") else col,
                dtype=np.int64))
            return _pack(sk)

        def combine(self, a: bytes, b: bytes) -> bytes:
            sk = _unpack(a)
            sk.merge(_unpack(b))
            return _pack(sk)

        def finalize(self, acc: bytes):
            sk = _unpack(acc)
            out = [sk.err]
            for key, c in sorted(sk.counters.items(),
                                 key=lambda kv: (-kv[1], kv[0])):
                out.extend((key, c))
            return out

    return HeavyHitters()


# ---------------------------------------------------------------------------
# HLL as a first-class Ray Data aggregator
# ---------------------------------------------------------------------------

def make_hll_aggregator(on: str, p: int = 12, name: str = None,
                        raw_registers: bool = False):
    """HyperLogLog distinct-count as a ``ray.data`` ``AggregateFnV2`` —
    usable directly in ``ds.groupby(...).aggregate(...)`` like Sum/Count.
    The accumulator is the 2^p-byte register array (bytes, trivially
    serializable); combine is elementwise max; finalize is the HLL
    estimate — or the raw register bytes when ``raw_registers`` is set,
    the form set-ALGEBRA consumers need (union = elementwise max of two
    sides' registers; intersection via inclusion-exclusion)."""
    from ray.data.aggregate import AggregateFnV2

    class HLLDistinct(AggregateFnV2):
        def __init__(self):
            super().__init__(name or f"hll_distinct({on})",
                             zero_factory=lambda: bytes(1 << p),
                             on=on, ignore_nulls=True)

        def aggregate_block(self, block) -> bytes:
            h = HLL(p)
            col = block.column(on) if hasattr(block, "column") else block[on]
            vals = np.asarray(col.to_numpy() if hasattr(col, "to_numpy")
                              else col, dtype=np.uint64)
            h.add_ints(vals)
            return h.registers.tobytes()

        def combine(self, a: bytes, b: bytes) -> bytes:
            return np.maximum(np.frombuffer(a, np.uint8),
                              np.frombuffer(b, np.uint8)).tobytes()

        def finalize(self, acc: bytes):
            if raw_registers:
                return acc
            h = HLL(p)
            h.merge_registers(np.frombuffer(acc, np.uint8))
            return h.estimate()

    return HLLDistinct()


def make_ddsketch_aggregator(on: str, alpha: float = 0.01,
                             qs: tuple = (0.5, 0.9, 0.99),
                             name: str = None, include_count: bool = False):
    """DDSketch quantiles as an ``AggregateFnV2``: the accumulator is the
    sparse (bin -> count) dict plus the underflow count; combine adds bins;
    finalize emits the requested quantiles as a fixed-size list<double>
    (one aggregate column; unpack downstream).  ``include_count`` appends
    the exact row count as a final list element."""
    from ray.data.aggregate import AggregateFnV2

    def _pack(sk: DDSketch) -> bytes:
        # accumulator must be an Arrow-native type (bytes), or Ray falls
        # back to pickled-object blocks: int64 [underflow, k bins..., k counts...]
        keys = np.fromiter(sk.bins.keys(), dtype=np.int64, count=len(sk.bins))
        counts = np.fromiter(sk.bins.values(), dtype=np.int64,
                             count=len(sk.bins))
        return np.concatenate(([sk.n_underflow], keys, counts)).tobytes()

    def _unpack(acc: bytes) -> DDSketch:
        sk = DDSketch(alpha)
        if not acc:
            return sk
        arr = np.frombuffer(acc, np.int64)
        k = (len(arr) - 1) // 2
        sk.merge(dict(zip(arr[1:1 + k].tolist(), arr[1 + k:].tolist())),
                 int(arr[0]))
        return sk

    class DDQuantiles(AggregateFnV2):
        def __init__(self):
            super().__init__(name or f"dd_quantiles({on})",
                             zero_factory=lambda: b"",
                             on=on, ignore_nulls=True)

        def aggregate_block(self, block) -> bytes:
            sk = DDSketch(alpha)
            col = block.column(on) if hasattr(block, "column") else block[on]
            sk.add(np.asarray(col.to_numpy() if hasattr(col, "to_numpy")
                              else col, dtype=np.float64))
            return _pack(sk)

        def combine(self, a: bytes, b: bytes) -> bytes:
            sk = _unpack(a)
            other = _unpack(b)
            sk.merge(other.bins, other.n_underflow)
            return _pack(sk)

        def finalize(self, acc: bytes):
            sk = _unpack(acc)
            out = [sk.quantile(q) for q in qs]
            if include_count:
                out.append(float(sk.count))
            return out

    return DDQuantiles()


# ---------------------------------------------------------------------------
# Bloom filter (membership sketch)
# ---------------------------------------------------------------------------

_HEXVAL = np.zeros(256, np.uint8)
for _i, _c in enumerate(b"0123456789abcdef"):
    _HEXVAL[_c] = _i


def bloom_positions(fp_hex: "pa.Array | pa.ChunkedArray",
                    m_bits: int, k: int = 4) -> np.ndarray:
    """(n, k) bit positions for md5-hex fingerprints, vectorized straight
    off the Arrow string buffer: the 128-bit digest splits into four
    independent 32-bit words (md5's bits are uniform), each reduced mod
    ``m_bits``.  Deterministic across workers/engines by construction.

    The digest yields exactly 4 independent 32-bit words, so k > 4 would
    silently return fewer hash positions than requested (a worse
    false-positive rate than documented) — fail loudly instead."""
    import pyarrow as pa
    if not 1 <= k <= 4:
        raise ValueError(
            f"bloom_positions supports 1 <= k <= 4 (got k={k}): the "
            "128-bit md5 digest splits into only 4 independent 32-bit "
            "words")
    if isinstance(fp_hex, pa.ChunkedArray):
        fp_hex = fp_hex.combine_chunks()
    n = len(fp_hex)
    if n == 0:
        return np.zeros((0, k), np.int64)
    off_dtype = (np.int64 if pa.types.is_large_string(fp_hex.type)
                 else np.int32)
    off = np.frombuffer(fp_hex.buffers()[1], dtype=off_dtype,
                        count=n + 1,
                        offset=fp_hex.offset * off_dtype().itemsize)
    assert int(off[-1] - off[0]) == 32 * n, "expected 32-char md5 hex"
    data = np.frombuffer(fp_hex.buffers()[2], np.uint8)[
        int(off[0]):int(off[-1])]
    nib = _HEXVAL[data].reshape(n, 32)
    bytes16 = (nib[:, 0::2] << 4) | nib[:, 1::2]          # (n, 16)
    words = np.ascontiguousarray(bytes16).view(">u4").astype(np.int64)
    return words[:, :k] % m_bits


def make_bloom_aggregator(on: str, m_bits: int = 1 << 20, k: int = 4,
                          name: str = None):
    """Bloom membership filter as an ``AggregateFnV2``: the accumulator is
    the m-bit bitmap (bytes); combine is bitwise OR; finalize returns the
    packed bitmap for broadcasting to a probe stage.  With k=4 hashes the
    false-positive rate is (1-e^{-kn/m})^k — ~1.2% at n = m/8 members."""
    from ray.data.aggregate import AggregateFnV2

    nbytes = m_bits // 8

    class BloomBuild(AggregateFnV2):
        def __init__(self):
            super().__init__(name or f"bloom({on})",
                             zero_factory=lambda: bytes(nbytes),
                             on=on, ignore_nulls=True)

        def aggregate_block(self, block) -> bytes:
            col = block.column(on) if hasattr(block, "column") else block[on]
            import pyarrow.compute as pc
            col = pc.drop_null(col)
            pos = bloom_positions(col, m_bits, k).ravel()
            bm = np.zeros(nbytes, np.uint8)
            np.bitwise_or.at(bm, pos >> 3,
                             np.uint8(1) << (pos & 7).astype(np.uint8))
            return bm.tobytes()

        def combine(self, a: bytes, b: bytes) -> bytes:
            return np.bitwise_or(np.frombuffer(a, np.uint8),
                                 np.frombuffer(b, np.uint8)).tobytes()

        def finalize(self, acc: bytes) -> bytes:
            return acc

    return BloomBuild()


def bloom_probe(bitmap: bytes, fp_hex, m_bits: int,
                k: int = 4) -> np.ndarray:
    """Membership probe against a packed bloom bitmap: True where ALL k
    bit positions are set (no false negatives; false positives at the
    documented rate)."""
    bm = np.frombuffer(bitmap, np.uint8)
    pos = bloom_positions(fp_hex, m_bits, k)                # (n, k)
    bits = (bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


# ---------------------------------------------------------------------------
# Count-Min sketch (point-frequency sketch)
# ---------------------------------------------------------------------------

# fixed row-salt constants (any distinct odd values work; pinned so every
# worker and every session builds the identical sketch)
_CMS_SEEDS = np.array([0x243F6A8885A308D3, 0x13198A2E03707344,
                       0xA4093822299F31D0, 0x082EFA98EC4E6C89,
                       0x452821E638D01377, 0xBE5466CF34E90C6C,
                       0x3F84D5B5B5470917, 0x9216D5D98979FB1B],
                      dtype=np.uint64)


class CountMin:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): a d×w counter
    matrix; each item increments one cell per row (splitmix64 with a
    per-row salt), a point estimate is the MIN over rows.  Guarantees:
    estimate >= true count ALWAYS (overcount-only), and
    estimate <= true + e·N/w with probability >= 1 − (1/e)^d for any
    fixed key.  The sketch is LINEAR — merge is elementwise counter
    addition — so per-block partials combine associatively anywhere in
    an aggregation tree, the property HLL/Bloom share."""

    def __init__(self, w: int = 2048, d: int = 4):
        if not 1 <= d <= len(_CMS_SEEDS):
            raise ValueError(f"CountMin supports 1 <= d <= "
                             f"{len(_CMS_SEEDS)} rows (got d={d})")
        self.w, self.d = w, d
        self.counts = np.zeros((d, w), dtype=np.int64)
        self.n = 0                     # total items added (exact)

    def _positions(self, values: np.ndarray) -> np.ndarray:
        """(d, n) column index per row for int64/uint64 keys."""
        v = values.astype(np.uint64, copy=False)
        return np.stack([splitmix64(v ^ s) % np.uint64(self.w)
                         for s in _CMS_SEEDS[:self.d]])

    def add_ints(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        pos = self._positions(values)
        for r in range(self.d):
            np.add.at(self.counts[r], pos[r], 1)
        self.n += len(values)

    def merge(self, other: "CountMin") -> None:
        self.counts += other.counts
        self.n += other.n

    def estimate_ints(self, keys: np.ndarray) -> np.ndarray:
        """Point estimates for int keys: min over rows."""
        pos = self._positions(np.asarray(keys))
        ests = np.stack([self.counts[r][pos[r]] for r in range(self.d)])
        return ests.min(axis=0)


def make_cms_aggregator(on: str, w: int = 2048, d: int = 4,
                        name: str = None):
    """Count-Min as a ``ray.data`` ``AggregateFnV2``: the accumulator is
    the packed int64 [n, d·w counters] buffer; combine is elementwise
    addition (CMS linearity); finalize returns the raw packed sketch —
    callers probe it with ``cms_estimate``."""
    from ray.data.aggregate import AggregateFnV2

    def _pack(sk: CountMin) -> bytes:
        return np.concatenate(([np.int64(sk.n)],
                               sk.counts.ravel())).tobytes()

    class CMSBuild(AggregateFnV2):
        def __init__(self):
            super().__init__(name or f"cms({on})",
                             zero_factory=lambda: bytes(8 * (1 + d * w)),
                             on=on, ignore_nulls=True)

        def aggregate_block(self, block) -> bytes:
            sk = CountMin(w, d)
            col = block.column(on) if hasattr(block, "column") else block[on]
            vals = np.asarray(col.to_numpy() if hasattr(col, "to_numpy")
                              else col, dtype=np.int64)
            sk.add_ints(vals)
            return _pack(sk)

        def combine(self, a: bytes, b: bytes) -> bytes:
            return (np.frombuffer(a, np.int64)
                    + np.frombuffer(b, np.int64)).tobytes()

        def finalize(self, acc: bytes) -> bytes:
            return acc

    return CMSBuild()


def cms_estimate(packed: bytes, keys: np.ndarray, w: int = 2048,
                 d: int = 4) -> "tuple[np.ndarray, int]":
    """Probe a packed CMS buffer: (point estimates for ``keys``, total
    item count n)."""
    arr = np.frombuffer(packed, np.int64)
    sk = CountMin(w, d)
    sk.n = int(arr[0])
    sk.counts = arr[1:].reshape(d, w).copy()
    return sk.estimate_ints(keys), sk.n
