"""Time-series compression codecs — "mimir-ts v1".

- Timestamps: delta-of-delta with the Gorilla §4.1.1 range ladder
  ('0' | '10'+7b | '110'+9b | '1110'+12b | '1111'+64b).
- Values: Gorilla XOR, simplified (each non-zero XOR re-encodes its own
  leading/meaningful window: '0' | '1' + 6b lead + 6b (meaningful−1) +
  meaningful bits). The simplification removes the sequential window-reuse
  dependency of canonical Gorilla so ENCODE IS FULLY VECTORIZED in numpy —
  bit layout pinned identically in oracle/reference.py (the pure-Python
  reference the bitstreams must match byte-for-byte).

Format notes: bitstreams are MSB-first, zero-padded to a byte boundary;
first_ts / first value of each measure ride out-of-band in chunk columns
(n_points, first_ts, first_val, first_bytes).

Encode runs inside Arrow-batched ``applyInPandas`` grouped by (host, tier) —
mirroring the reference's chunked ``pack(1000).par_map`` bulk pipeline
(/root/reference/libs/mimir/src/rubber.rs:684-699) whose chunk = our Arrow
batch. No per-row Python anywhere on the encode path (north rule).

Decode is vectorized in three phases (see the decode section): a per-bit
record-length table (numpy), the record-start chain (the only sequential
step — one list-indexed add per point), and vectorized payload extraction
with cumsum / cumulative-XOR reconstruction. ~10-40x faster than the prior
per-field bit reader; serving reads from compressed chunks are no longer
the slowest kernel in the engine.

Family context (PAPERS.md): Gorilla-style XOR value compression and its
successors (e.g. Chimp, VLDB 2022) — this engine pins the simplified XOR
variant above for vectorizability; swapping in a Chimp-style leading-zero
table is a kernel-local change behind the same chunk schema.

Scale: one task per (host, tier) group; groups are rolled-up series (bounded
by time range, not doc count) so group size is even across hosts — the skew
answer of gapfill.py applies here too. At 100 TB, chunking further splits by
time (chunk_start) via the same groupby key extension.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# vectorized bit packing
# ---------------------------------------------------------------------------


def _pack_fields(fields: list[tuple[np.ndarray, np.ndarray]]) -> bytes:
    """Pack per-element variable-length bit fields into a single MSB-first
    bitstream. ``fields`` is an ordered list of (values uint64, nbits int64)
    arrays, all of length n; element i contributes field1[i], field2[i], …
    consecutively. Fully vectorized (no per-element Python)."""
    if not fields:
        return b""
    n = len(fields[0][0])
    if n == 0:
        return b""
    lens = np.stack([f[1] for f in fields], axis=1)  # (n, k)
    flat_lens = lens.reshape(-1)  # element-major, field-minor
    total = int(flat_lens.sum())
    if total == 0:
        return b""
    starts = np.concatenate([[0], np.cumsum(flat_lens)[:-1]])
    flat_vals = np.stack([f[0].astype(np.uint64) for f in fields], axis=1).reshape(-1)

    nz = flat_lens > 0
    lens_nz = flat_lens[nz]
    vals_rep = np.repeat(flat_vals[nz], lens_nz)
    lens_rep = np.repeat(lens_nz, lens_nz)
    starts_rep = np.repeat(starts[nz], lens_nz)
    within = np.arange(len(vals_rep), dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(lens_nz)[:-1]]), lens_nz
    )
    shift = (lens_rep - 1 - within).astype(np.uint64)
    bits = ((vals_rep >> shift) & np.uint64(1)).astype(np.uint8)
    out = np.zeros(total, dtype=np.uint8)
    out[starts_rep + within] = bits
    return np.packbits(out).tobytes()


def encode_dod(ts: np.ndarray) -> bytes:
    """ts: int64 epoch seconds, ascending. Bitstream for points 1..n-1."""
    ts = np.asarray(ts, dtype=np.int64)
    if len(ts) < 2:
        return b""
    deltas = np.diff(ts)
    dod = np.diff(np.concatenate([[0], deltas]))  # dod_1 = delta_1
    a = np.abs(dod)
    # range ladder (asymmetric upper bounds per Gorilla §4.1.1)
    zero = dod == 0
    r7 = ~zero & (dod >= -63) & (dod <= 64)
    r9 = ~zero & ~r7 & (dod >= -255) & (dod <= 256)
    r12 = ~zero & ~r7 & ~r9 & (dod >= -2047) & (dod <= 2048)
    r64 = ~zero & ~r7 & ~r9 & ~r12

    prefix_val = np.select([zero, r7, r9, r12, r64], [0, 0b10, 0b110, 0b1110, 0b1111]).astype(np.uint64)
    prefix_len = np.select([zero, r7, r9, r12, r64], [1, 2, 3, 4, 4]).astype(np.int64)
    payload_val = np.select(
        [zero, r7, r9, r12, r64],
        [0, dod + 63, dod + 255, dod + 2047, dod],
    ).astype(np.int64).astype(np.uint64)  # two's complement for r64
    payload_len = np.select([zero, r7, r9, r12, r64], [0, 7, 9, 12, 64]).astype(np.int64)
    _ = a
    return _pack_fields([(prefix_val, prefix_len), (payload_val, payload_len)])


def encode_gorilla(vals: np.ndarray) -> bytes:
    """vals: int64. XOR bitstream for points 1..n-1 (first carried out-of-band)."""
    v = np.asarray(vals, dtype=np.int64).astype(np.uint64)
    if len(v) < 2:
        return b""
    x = v[1:] ^ v[:-1]
    nonzero = x != 0
    # bit_length via log2 on floats is unsafe for 64-bit; use a bit trick:
    # count leading zeros by comparing against powers of two cumulatively.
    bl = np.zeros(len(x), dtype=np.int64)
    xx = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        ge = xx >= (np.uint64(1) << np.uint64(shift))
        bl[ge] += shift
        xx[ge] >>= np.uint64(shift)
    bl = bl + (xx > 0).astype(np.int64)  # = bit_length(x)
    lead = np.minimum(64 - bl, 63)
    meaningful = 64 - lead

    ctrl = nonzero.astype(np.uint64)
    ctrl_len = np.ones(len(x), dtype=np.int64)
    lead_len = np.where(nonzero, 6, 0).astype(np.int64)
    mlen_len = np.where(nonzero, 6, 0).astype(np.int64)
    mbits_len = np.where(nonzero, meaningful, 0).astype(np.int64)
    return _pack_fields(
        [
            (ctrl, ctrl_len),
            (lead.astype(np.uint64), lead_len),
            ((meaningful - 1).astype(np.uint64) & np.uint64(63), mlen_len),
            (x, mbits_len),
        ]
    )


# ---------------------------------------------------------------------------
# decode — vectorized three-phase scan
# ---------------------------------------------------------------------------
# Variable-length prefix codes are sequential ONLY in where each record
# starts. Decode therefore runs in three phases:
#   1. a fully vectorized per-bit-position table L[p] = "record length if a
#      record started at bit p" (numpy over the whole bitstream);
#   2. the record-start chain p_{i+1} = p_i + L[p_i] — a bare list-indexed
#      Python loop, one add per point (~50 ns/pt, vs ~1 µs/pt for the old
#      per-field bit reader);
#   3. fully vectorized payload extraction (gather 9 bytes per record,
#      big-endian uint64 window shift) and reconstruction — double cumsum
#      for delta-of-delta timestamps, cumulative XOR for Gorilla values.


def _read_bits_at(padded: np.ndarray, pos: np.ndarray, nbits) -> np.ndarray:
    """Vectorized MSB-first bit-field reads: for each i, the ``nbits[i]``-bit
    big-endian field starting at absolute bit position ``pos[i]``. ``padded``
    must be a uint8 byte array with >= 12 bytes of zero slack past the end
    (a read may start up to 12 bits past the stream's final bit).
    nbits in [0, 64]; returns uint64."""
    byte0 = pos >> 3
    off = (pos & 7).astype(np.uint64)
    b = padded[byte0[:, None] + np.arange(9)]
    hi = b[:, :8].copy().view(">u8").reshape(-1).astype(np.uint64)
    lo = b[:, 8].astype(np.uint64)
    # 64-bit window whose MSB is the field's first bit
    win = hi << off
    has_off = off > 0
    win = win | np.where(has_off, lo >> ((np.uint64(8) - off) % np.uint64(8)), np.uint64(0))
    k = np.asarray(nbits, dtype=np.uint64)
    shift = np.minimum(np.uint64(64) - k, np.uint64(63))  # avoid UB shift-by-64 (k=0)
    return np.where(k > 0, win >> shift, np.uint64(0))


def _record_starts(L: np.ndarray, n_records: int) -> np.ndarray:
    """Walk the record chain p += L[p] (the only inherently sequential step).
    ``L`` is uint8 (max record length 77 bits < 256): a `bytes` view gives
    C-speed indexing without materializing a per-position int list."""
    Lb = L.tobytes()
    pos = np.empty(n_records, dtype=np.int64)
    p = 0
    for i in range(n_records):
        pos[i] = p
        p += Lb[p]
    return pos


def decode_dod(data: bytes, first_ts: int, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    out[0] = first_ts
    if n == 1:
        return out
    buf = np.frombuffer(data, dtype=np.uint8)
    padded = np.concatenate([buf, np.zeros(12, dtype=np.uint8)])
    bits = np.unpackbits(buf)
    bp = np.concatenate([bits, np.zeros(4, dtype=np.uint8)])
    b0, b1, b2, b3 = bp[:-4], bp[1:-3], bp[2:-2], bp[3:-1]
    # '0'→1 | '10'+7→9 | '110'+9→12 | '1110'+12→16 | '1111'+64→68
    one = np.uint8(1)
    L = np.where(
        b0 == 0,
        one,
        np.where(b1 == 0, np.uint8(9), np.where(b2 == 0, np.uint8(12), np.where(b3 == 0, np.uint8(16), np.uint8(68)))),
    )
    pos = _record_starts(L, n - 1)
    Lr = L[pos]
    cases = [Lr == 1, Lr == 9, Lr == 12, Lr == 16, Lr == 68]
    plen = np.select(cases, [0, 7, 9, 12, 64]).astype(np.int64)
    poff = np.select(cases, [0, 2, 3, 4, 4]).astype(np.int64)
    raw = _read_bits_at(padded, pos + poff, plen)
    # two's-complement reinterpret: exact for the 64b case, and identical to
    # a plain cast for the small (<= 12 bit) cases
    signed = raw.view(np.int64)
    dod = np.select(
        cases,
        [np.zeros(len(raw), dtype=np.int64), signed - 63, signed - 255, signed - 2047, signed],
    )
    out[1:] = int(first_ts) + np.cumsum(np.cumsum(dod))
    return out


def decode_gorilla(data: bytes, first_val: int, n: int) -> np.ndarray:
    first = np.uint64(int(first_val) & 0xFFFFFFFFFFFFFFFF)
    if n == 1:
        return np.array([first], dtype=np.uint64).view(np.int64).copy()
    buf = np.frombuffer(data, dtype=np.uint8)
    padded = np.concatenate([buf, np.zeros(12, dtype=np.uint8)])
    bits = np.unpackbits(buf)
    bp = np.concatenate([bits, np.zeros(13, dtype=np.uint8)])
    # 6-bit meaningful-length field at p+7..p+12, for every position p
    # (uint8 arithmetic throughout: max value 63, no 8-byte promotion)
    nb = len(bits)
    mf = (bp[7:] << 5)[:nb]
    for j, s in ((8, 4), (9, 3), (10, 2), (11, 1)):
        mf += (bp[j:] << s)[:nb]
    mf += bp[12:][:nb]
    # '0'→1 | '1'+6 lead+6 mlen+(mf+1) meaningful→14+mf  (max 77, fits uint8)
    L = np.where(bits == 0, np.uint8(1), np.uint8(14) + mf)
    pos = _record_starts(L, n - 1)
    ctrl = bits[pos]
    mbits = np.where(ctrl == 1, mf[pos].astype(np.int64) + 1, 0)
    xors = _read_bits_at(padded, pos + 13, mbits)  # 0 where ctrl == 0
    vals = np.empty(n, dtype=np.uint64)
    vals[0] = first
    vals[1:] = xors
    return np.bitwise_xor.accumulate(vals).view(np.int64).copy()


# ---------------------------------------------------------------------------
# Spark integration: chunk tables via applyInPandas
# ---------------------------------------------------------------------------

CHUNK_SCHEMA = (
    "host string, tier string, chunk_start timestamp, ts_dod binary, "
    "val_gorilla binary, bytes_gorilla binary, n_points int, first_ts long, "
    "first_val long, first_bytes long, last_ts long"
)


def _encode_group_fn(max_points):
    def _encode_group(key, pdf):
        host, tier = key[0], key[1]  # key may carry a trailing _month split key
        pdf = pdf.sort_values("bucket_ts", kind="mergesort")
        sec = (pdf["bucket_ts"].astype("datetime64[us]").astype("int64") // 1_000_000).to_numpy()
        dc = pdf["doc_count"].to_numpy().astype(np.int64)
        bs = pdf["bytes_sum"].to_numpy().astype(np.int64)
        step = max_points or len(sec) or 1
        rows = {k: [] for k in (
            "host", "tier", "chunk_start", "ts_dod", "val_gorilla", "bytes_gorilla",
            "n_points", "first_ts", "first_val", "first_bytes", "last_ts")}
        for lo in range(0, len(sec), step):
            hi = min(lo + step, len(sec))
            rows["host"].append(host)
            rows["tier"].append(tier)
            rows["chunk_start"].append(pd.Timestamp(int(sec[lo]), unit="s"))
            rows["ts_dod"].append(encode_dod(sec[lo:hi]))
            rows["val_gorilla"].append(encode_gorilla(dc[lo:hi]))
            rows["bytes_gorilla"].append(encode_gorilla(bs[lo:hi]))
            rows["n_points"].append(hi - lo)
            rows["first_ts"].append(int(sec[lo]))
            rows["first_val"].append(int(dc[lo]))
            rows["first_bytes"].append(int(bs[lo]))
            # Actual last point (NOT chunk_start + n_points*step): the host
            # series is not gap-filled, so a chunk's span is unbounded by its
            # point count — time-range pruning must use the real extent.
            rows["last_ts"].append(int(sec[hi - 1]))
        return pd.DataFrame(rows)

    return _encode_group


def encode_chunks(
    host_series_df: DataFrame,
    tier: str,
    max_points_per_chunk: int | None = None,
    split_by_month: bool = False,
) -> DataFrame:
    """Host-level tier series → compressed chunks per (host, tier).
    ``max_points_per_chunk`` splits long series into multiple chunks (the
    100 TB path: bounded chunk size → bounded decode/update units and
    time-range pruning by chunk_start); default one chunk per host (matches
    the golden oracle chunks). ``split_by_month`` additionally closes chunks
    at UTC month boundaries (the groupby-key time extension): every point of
    a chunk then falls inside month(chunk_start), which is what makes
    partition-level month pruning of the published chunk table EXACT — a
    month-spanning chunk would otherwise be invisible to it."""
    from pyspark.sql import functions as F

    df = host_series_df.withColumn("tier", F.lit(tier))
    keys = ["host", "tier"]
    if split_by_month:
        df = df.withColumn("_month", F.date_format("bucket_ts", "yyyy-MM"))
        keys.append("_month")
    return df.groupBy(*keys).applyInPandas(
        _encode_group_fn(max_points_per_chunk), schema=CHUNK_SCHEMA
    )


def chunk_partition_col(host_buckets: int):
    """Composite partition key for published chunk tables:
    '<host bucket>|<month of chunk_start>'. Host bucket = crc32(host) %
    host_buckets — crc32 is computable identically driver-side
    (zlib.crc32), so the read path can map requested hosts to buckets
    without a Spark job. Requires encode_chunks(split_by_month=True) for
    the month half to be a sound pruning key."""
    from pyspark.sql import functions as F

    # format_string('%04d') zero-pads to a MINIMUM width (printf): buckets
    # beyond 9999 keep all their digits, exactly like the driver-side twin's
    # '04d'. lpad would TRUNCATE a 5-digit bucket to 4 chars — write-side
    # '1234|...' vs probe-side '12345|...' = rows silently unreachable.
    hb = F.format_string(
        "%04d", F.pmod(F.crc32(F.col("host")), F.lit(host_buckets))
    )
    return F.concat_ws("|", hb, F.date_format("chunk_start", "yyyy-MM"))


def chunk_host_bucket(host: str, host_buckets: int) -> str:
    """Driver-side twin of the host-bucket half of chunk_partition_col."""
    import zlib

    return format(zlib.crc32(host.encode("utf-8")) % host_buckets, "04d")


def decode_chunks_pdf(chunks: pd.DataFrame) -> pd.DataFrame:
    """Round-trip: chunks (pandas) → host-level series rows (validation)."""
    rows = []
    for r in chunks.itertuples(index=False):
        ts = decode_dod(r.ts_dod, r.first_ts, r.n_points)
        dc = decode_gorilla(r.val_gorilla, r.first_val, r.n_points)
        bs = decode_gorilla(r.bytes_gorilla, r.first_bytes, r.n_points)
        for i in range(r.n_points):
            rows.append((r.host, pd.Timestamp(int(ts[i]), unit="s"), int(dc[i]), int(bs[i])))
    return pd.DataFrame(rows, columns=["host", "bucket_ts", "doc_count", "bytes_sum"])


def _decode_group(pdf):
    rows = {"host": [], "tier": [], "bucket_ts": [], "doc_count": [], "bytes_sum": []}
    for r in pdf.itertuples(index=False):
        ts = decode_dod(r.ts_dod, r.first_ts, r.n_points)
        dc = decode_gorilla(r.val_gorilla, r.first_val, r.n_points)
        bs = decode_gorilla(r.bytes_gorilla, r.first_bytes, r.n_points)
        rows["host"].extend([r.host] * r.n_points)
        rows["tier"].extend([r.tier] * r.n_points)
        rows["bucket_ts"].extend(pd.to_datetime(ts, unit="s"))
        rows["doc_count"].extend(dc.tolist())
        rows["bytes_sum"].extend(bs.tolist())
    yield pd.DataFrame(rows)


def decode_chunks(chunks_df: DataFrame) -> DataFrame:
    """Spark-side chunk read path: compressed chunk rows → host-level series
    rows (mapInPandas; one Arrow batch of chunks in, the decoded points out).
    The distributed inverse of encode_chunks — used by query layers that
    serve directly from compressed storage."""

    def batches(it):
        for pdf in it:
            yield from _decode_group(pdf)

    return chunks_df.mapInPandas(
        batches,
        schema="host string, tier string, bucket_ts timestamp, doc_count long, bytes_sum long",
    )
