"""Gorilla compression — delta-of-delta timestamps + XOR float64 values.

Scheme follows the Facebook Gorilla paper (Pelkonen et al., VLDB 2015,
"Gorilla: A Fast, Scalable, In-Memory Time Series Database", §4.1), public
knowledge; no reference-repo analog exists (SURVEY.md §2.11).

Timestamp stream (int64 microseconds):
  [t0: 64 bits raw] [d0 = t1−t0: 64 bits two's complement] then per point
  dod = d_i − d_{i−1} prefix-coded:
    dod == 0            → '0'
    dod ∈ [−63, 64]     → '10'   + 7  bits (dod+63)
    dod ∈ [−255, 256]   → '110'  + 9  bits (dod+255)
    dod ∈ [−2047, 2048] → '1110' + 12 bits (dod+2047)
    else                → '1111' + 64 bits two's complement
  (the else branch is 64-bit, not the paper's 32, because microsecond
  transcripts can jump days — documented deviation.)

Value stream (float64 bit patterns):
  [v0: 64 bits raw]; per point x = u_i XOR u_{i−1}:
    x == 0                              → '0'
    x fits previous (leading,length) wnd → '10' + length bits
    else                                → '11' + 5b leading(≤31) + 6b (sig−1)
                                           + sig bits

Encoding is numpy-vectorized: classification, bit-lengths and the final
bit-packing (word-level ``np.bitwise_or.at`` scatter) are array ops; only the
value-window control decision is a tight scalar loop (inherent sequential
dependency on the previous window). Decoding is a sequential bit reader.
Both are bit-exact inverses — the rollup tiers' bit-exactness criterion is
tested through an encode∘decode identity on the real tier output.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MASK64 = (1 << 64) - 1


# ----------------------------------------------------------- bit packing

def _pack_bits(codes: np.ndarray, nbits: np.ndarray) -> tuple[bytes, int]:
    """Pack (code, nbits) pairs MSB-first into a byte string. Vectorized:
    every code lands in at most two 64-bit words via scatter-OR."""
    codes = codes.astype(np.uint64, copy=True)
    nbits = nbits.astype(np.int64)
    # mask codes to their width (width 64 keeps all bits)
    lt64 = nbits < 64
    masks = np.full(len(codes), _U64(_MASK64), dtype=np.uint64)
    masks[lt64] = (_U64(1) << nbits[lt64].astype(np.uint64)) - _U64(1)
    codes &= masks

    total = int(nbits.sum())
    nwords = total // 64 + 2
    words = np.zeros(nwords, dtype=np.uint64)
    offs = np.cumsum(nbits) - nbits
    widx = offs >> 6
    end = (offs & 63) + nbits
    fits = end <= 64
    shift1 = np.where(fits, 64 - end, end - 64).astype(np.uint64)
    part1 = np.where(fits, codes << shift1, codes >> shift1)
    np.bitwise_or.at(words, widx, part1)
    spill = ~fits
    if spill.any():
        sh2 = (128 - end[spill]).astype(np.uint64)
        np.bitwise_or.at(words, widx[spill] + 1, codes[spill] << sh2)
    nbytes = (total + 7) // 8
    return words.byteswap().tobytes()[:nbytes], total


class _BitReader:
    """MSB-first bit reader over a byte string (single bigint, fast enough
    for tests and the decompress read path)."""

    def __init__(self, buf: bytes, total_bits: int | None = None):
        self._big = int.from_bytes(buf, "big")
        self._total = len(buf) * 8
        self.pos = 0
        self.limit = total_bits if total_bits is not None else self._total

    def read(self, n: int) -> int:
        shift = self._total - self.pos - n
        self.pos += n
        return (self._big >> shift) & ((1 << n) - 1)


def _signed(u: int, bits: int = 64) -> int:
    return u - (1 << bits) if u >= (1 << (bits - 1)) else u


# ------------------------------------------------------------ timestamps

def encode_timestamps(ts: np.ndarray) -> tuple[bytes, int, int]:
    """Encode int64 (microsecond) timestamps. Returns (blob, total_bits, n)."""
    ts = np.asarray(ts, dtype=np.int64)
    n = len(ts)
    if n == 0:
        return b"", 0, 0
    if n == 1:
        return _pack_bits(
            np.array([int(ts[0]) & _MASK64], dtype=np.uint64),
            np.array([64]),
        )[0], 64, 1

    deltas = np.diff(ts)
    dods = np.diff(deltas)  # n-2 entries
    codes = [
        np.array(
            [int(ts[0]) & _MASK64, int(deltas[0]) & _MASK64], dtype=np.uint64
        )
    ]
    bits = [np.array([64, 64], dtype=np.int64)]
    if len(dods):
        c = np.zeros(len(dods), dtype=np.uint64)
        b = np.zeros(len(dods), dtype=np.int64)
        zero = dods == 0
        b[zero] = 1  # '0'
        r1 = ~zero & (dods >= -63) & (dods <= 64)
        c[r1] = (0b10 << 7) | (dods[r1] + 63).astype(np.uint64)
        b[r1] = 9
        r2 = ~zero & ~r1 & (dods >= -255) & (dods <= 256)
        c[r2] = (0b110 << 9) | (dods[r2] + 255).astype(np.uint64)
        b[r2] = 12
        r3 = ~zero & ~r1 & ~r2 & (dods >= -2047) & (dods <= 2048)
        c[r3] = (0b1110 << 12) | (dods[r3] + 2047).astype(np.uint64)
        b[r3] = 16
        r4 = ~zero & ~r1 & ~r2 & ~r3
        if r4.any():
            # '1111' prefix + 64-bit two's complement, packed as two codes
            # would overflow one word; emit prefix and payload separately.
            pre = np.full(r4.sum(), 0b1111, dtype=np.uint64)
            # interleave: build combined arrays in original order
            c4 = dods[r4].astype(np.int64).astype(np.uint64)
            # expand arrays: for r4 positions we need two entries
            idx = np.nonzero(r4)[0]
            c_list, b_list = [], []
            last = 0
            for i, j in enumerate(idx):
                c_list.append(c[last:j])
                b_list.append(b[last:j])
                c_list.append(np.array([0b1111, c4[i]], dtype=np.uint64))
                b_list.append(np.array([4, 64], dtype=np.int64))
                last = j + 1
            c_list.append(c[last:])
            b_list.append(b[last:])
            # drop zero-width entries left at r4 slots (already replaced)
            c = np.concatenate(c_list)
            b = np.concatenate(b_list)
            keep = b > 0
            c, b = c[keep], b[keep]
        codes.append(c)
        bits.append(b)
    allc = np.concatenate(codes)
    allb = np.concatenate(bits)
    blob, total = _pack_bits(allc, allb)
    return blob, total, n


def decode_timestamps(blob: bytes, total_bits: int, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    r = _BitReader(blob, total_bits)
    out[0] = _signed(r.read(64))
    if n == 1:
        return out
    delta = _signed(r.read(64))
    out[1] = out[0] + delta
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            dod = _signed(r.read(64))
        delta += dod
        out[i] = out[i - 1] + delta
    return out


# ---------------------------------------------------------------- values

def encode_values(vals: np.ndarray) -> tuple[bytes, int, int]:
    """Encode float64 values (XOR scheme). Returns (blob, total_bits, n)."""
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    n = len(vals)
    if n == 0:
        return b"", 0, 0
    u = vals.view(np.uint64)
    xors = (u[1:] ^ u[:-1]) if n > 1 else np.array([], dtype=np.uint64)
    codes = np.empty(2 * n, dtype=np.uint64)
    bits = np.empty(2 * n, dtype=np.int64)
    codes[0], bits[0] = u[0], 64
    k = 1
    lead_w, sig_w = -1, -1  # current window (invalid)
    xl = xors.tolist()
    for x in xl:
        if x == 0:
            codes[k], bits[k] = 0, 1
            k += 1
            continue
        lz = 64 - x.bit_length()
        if lz > 31:
            lz = 31
        tz = (x & -x).bit_length() - 1
        sig = 64 - lz - tz
        if (
            lead_w >= 0
            and lz >= lead_w
            and 64 - lz - sig >= 64 - lead_w - sig_w
        ):
            # fits current window → '10' + sig_w bits (prefix and payload
            # emitted separately: 2+sig_w may exceed one 64-bit code)
            payload = (x >> (64 - lead_w - sig_w)) & ((1 << sig_w) - 1)
            codes[k], bits[k] = 0b10, 2
            codes[k + 1], bits[k + 1] = payload, sig_w
            k += 2
        else:
            # new window → '11' + 5b lead + 6b (sig-1) + sig bits
            head = (0b11 << 11) | (lz << 6) | (sig - 1)
            codes[k], bits[k] = head, 13
            codes[k + 1] = (x >> tz) & ((1 << sig) - 1)
            bits[k + 1] = sig
            k += 2
            lead_w, sig_w = lz, sig
    blob, total = _pack_bits(codes[:k], bits[:k])
    return blob, total, n


def decode_values(blob: bytes, total_bits: int, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    r = _BitReader(blob, total_bits)
    prev = r.read(64)
    out[0] = prev
    lead_w, sig_w = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:  # '10' reuse window
            payload = r.read(sig_w)
            x = payload << (64 - lead_w - sig_w)
        else:  # '11' new window
            lead_w = r.read(5)
            sig_w = r.read(6) + 1
            payload = r.read(sig_w)
            x = payload << (64 - lead_w - sig_w)
        prev ^= x
        out[i] = prev
    return out.view(np.float64)


# ----------------------------------------------------- Spark integration

CHUNK_SCHEMA_SUFFIX = (
    "n_points long, ts_blob binary, ts_bits long, "
    "val_blob binary, val_bits long, raw_bytes long, enc_bytes long"
)


def gorilla_compress_chunks(
    df,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
):
    """applyInPandas: one Gorilla chunk row per key group.

    Groups arrive as Arrow batches; inside each group the points are sorted
    by timestamp (never shuffle order) so encoding is deterministic at any
    parallelism. Returns DataFrame(key_cols…, n_points, ts_blob, ts_bits,
    val_blob, val_bits, raw_bytes, enc_bytes)."""
    import pandas as pd

    from sequenzo_spark import ensure_workers_can_import

    ensure_workers_can_import(df.sparkSession)
    spark_df = df
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in spark_df.schema
        if f.name in key_cols
    )
    schema = f"{key_fields}, {CHUNK_SCHEMA_SUFFIX}"

    def enc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        ts = (
            pdf[ts_col]
            .astype("datetime64[us]")
            .astype("int64")
            .to_numpy()
        )
        vals = pdf[value_col].astype("float64").to_numpy()
        ts_blob, ts_bits, nn = encode_timestamps(ts)
        val_blob, val_bits, _ = encode_values(vals)
        row = {k: [pdf[k].iloc[0]] for k in key_cols}
        row.update(
            n_points=[nn],
            ts_blob=[ts_blob],
            ts_bits=[ts_bits],
            val_blob=[val_blob],
            val_bits=[val_bits],
            raw_bytes=[nn * 16],
            enc_bytes=[len(ts_blob) + len(val_blob)],
        )
        return pd.DataFrame(row)

    return spark_df.groupBy(*key_cols).applyInPandas(enc, schema=schema)


def gorilla_decompress_chunks(chunks_df, key_cols: list[str], value_col: str):
    """mapInPandas: expand chunk rows back to (key…, ts, value) points."""
    import pandas as pd

    from sequenzo_spark import ensure_workers_can_import

    ensure_workers_can_import(chunks_df.sparkSession)

    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in chunks_df.schema
        if f.name in key_cols
    )
    schema = f"{key_fields}, ts timestamp, {value_col} double"

    def dec(batches):
        for pdf in batches:
            outs = []
            for _, row in pdf.iterrows():
                n = int(row["n_points"])
                ts = decode_timestamps(row["ts_blob"], int(row["ts_bits"]), n)
                vals = decode_values(row["val_blob"], int(row["val_bits"]), n)
                d = {k: np.repeat(row[k], n) for k in key_cols}
                d["ts"] = pd.to_datetime(ts, unit="us")
                d[value_col] = vals
                outs.append(pd.DataFrame(d))
            yield pd.concat(outs) if outs else pd.DataFrame(
                columns=key_cols + ["ts", value_col]
            )

    return chunks_df.mapInPandas(dec, schema=schema)
