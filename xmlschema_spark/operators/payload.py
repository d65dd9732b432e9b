"""Binary payload validation via Arrow-batched UDFs (mapInArrow).

The slow path done right: bytes never cross per-row Python calls from
the JVM — Arrow moves whole columnar batches, and the Python side stays
cache-resident. Three generations of this stage were measured:

  mapInPandas, per-row numpy       51.9s / 2M rows @ local[32]
  mapInArrow, per-row numpy        26.5s             (round 1)
  mapInArrow, scratch-buffer math  this module       (round 2)

Round-2 structure (profiled: 106us/row -> ~35us/row single-core, and —
the part that matters for N->4N scaling on a shared-memory box — DRAM
traffic per row drops from ~75KB to ~12KB):
  * bytes are read as ZERO-COPY memoryview slices over the Arrow data
    buffer (no per-row bytes objects; zlib.decompress accepts buffers);
  * per-row Python is header unpack + zlib.decompress (the codec call is
    inherently per-image — ~16us/row of irreducible zlib CPU) + four
    numpy ufuncs over PREALLOCATED scratch buffers sized to the largest
    row in the batch, so the parity math runs in L1/L2 cache instead of
    allocating ~8 arrays per row (gen_pixels + psnr cost 68us/row and
    ~60KB/row of DRAM churn in round 1);
  * the expected deterministic pattern is SYNTHESIZED by one uint8
    np.add.outer of two L1-resident scanline vectors (it is separable:
    base + 5y + 3x + 17c) + an 8-byte stamp — near-zero DRAM reads (a
    full (w,h)-template cache costs a 6KB random DRAM read per row);
  * pixel parity needs only the integer SSE: exact-compare for lossless
    is SSE != 0, and PSNR < psnr_min is the exact algebra
    SSE/n > 255^2 * 10^(-psnr_min/10); SSE is computed int16-diff ->
    int32-square -> int64-sum, all exact. A batched variant over
    concatenated buffers was tried and REJECTED: np.add.reduceat(int32)
    runs 19us/row and the concat arrays (int16+int32 temporaries) push
    ~19 bytes/pixel through DRAM — on a memory-bandwidth-limited box
    that is the anti-scaling shape.

Column pruning matters at 100 TB: this stage is the ONLY one that reads
the `bytes` column; every other stage's scan prunes it away (verified in
tests via the parquet scan schema).

Checks (input_hint invariants; reference analog: fixed-value equality at
xmlschema/validators/elements.py:750-769 and binary validators at
validators/helpers.py:240-257):
  payload:required      — null payload
  payload:decode        — malformed/truncated payload
  payload:fmt           — container format != `fmt` column
  payload:dims          — decoded (w,h) != (`w`,`h`) columns
  payload:pixels        — decoded pixels vs expected deterministic
                          pattern: exact for lossless, PSNR>=40dB lossy
  payload:phash         — recomputed phash != `phash` column (optional)

The expected-pattern generator is a pluggable hook (the analog of
extra_validator, validators/validation.py:494-498): any callable
(image_id, w, h) -> uint8 ndarray. Real deployments plug a reference
decode; tests plug fakecodec.gen_pixels. The template fast path engages
only for the default generator; custom hooks are called per row but
still go through the scratch-buffer parity math.
"""

from __future__ import annotations

import math
import struct
import zlib
from typing import Callable, Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .. import fakecodec
from ..specs import PayloadSpec

VIOLATION_SCHEMA = T.StructType([
    T.StructField("row_key", T.StringType()),
    T.StructField("part_key", T.LongType()),
    T.StructField("constraint", T.StringType()),
    T.StructField("reason", T.StringType()),
    T.StructField("value", T.StringType()),
    T.StructField("occurs", T.LongType()),
])

_PA_SCHEMA = None  # built lazily on executors


def _pa_schema():
    import pyarrow as pa
    global _PA_SCHEMA
    if _PA_SCHEMA is None:
        _PA_SCHEMA = pa.schema([
            ("row_key", pa.string()), ("part_key", pa.int64()),
            ("constraint", pa.string()), ("reason", pa.string()),
            ("value", pa.string()), ("occurs", pa.int64())])
    return _PA_SCHEMA


def _expected_id_index(image_id: str) -> Optional[int]:
    """Row index recovered from the fixture id pattern img-NNN...; None
    when ids are not fixture-shaped (pixel parity then skipped)."""
    if image_id and image_id.startswith("img-"):
        tail = image_id[4:]
        if tail.isdigit():
            return int(tail)
    return None


def default_expected_pixels(image_id: str, w: int, h: int):
    i = _expected_id_index(image_id)
    if i is None:
        return None
    return fakecodec.gen_pixels(i, w, h)


def _binary_views(arr):
    """(offsets int64 ndarray, data memoryview, isnull bool ndarray) for a
    pyarrow Binary/LargeBinary array — zero-copy row access."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    if arr.null_count:
        isnull = pc.is_null(arr).to_numpy(zero_copy_only=False)
    else:
        isnull = None
    off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype,
                            count=arr.offset + len(arr) + 1)[arr.offset:]
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    return offsets.astype(np.int64, copy=False), data, isnull


class _Scratch:
    """Per-batch reusable buffers for the parity math: the whole pixel
    pipeline for one row fits in L1/L2 and allocates nothing.

    The expected pattern base + 5y + 3x + 17c is SEPARABLE: it is the
    uint8 outer sum of a per-h scanline offset vector (h bytes) and a
    per-w inner scanline (w*3 bytes, L1-resident). Synthesizing it with
    one np.add.outer keeps the expected-pattern DRAM READ traffic near
    zero — a full (w, h) template cache is a ~30MB random-access working
    set per worker that costs a 6KB DRAM read per row (measured as part
    of the N->4N shared-bandwidth ceiling)."""

    def __init__(self):
        import numpy as np
        self.np = np
        self.cap = 0
        self.exp8 = self.d16 = self.sq = None
        self._inner: dict = {}     # w -> (3x + 17c) scanline, uint8
        self._ys: dict = {}        # h -> (5y) offsets, uint8

    def ensure(self, n: int):
        if n > self.cap:
            np = self.np
            self.cap = max(n, 2 * self.cap, 4096)
            self.exp8 = np.empty(self.cap, np.uint8)
            self.d16 = np.empty(self.cap, np.int16)
            self.sq = np.empty(self.cap, np.int32)

    def sse(self, a, ev) -> int:
        """Exact integer sum of squared differences of two uint8 views."""
        np = self.np
        n = a.size
        dv = self.d16[:n]
        np.subtract(a, ev, out=dv, dtype=np.int16, casting="unsafe")
        sv = self.sq[:n]
        # dtype=int32 is LOAD-BEARING: np.square(dv, out=sv) without it
        # selects the int16 loop and casts AFTER — diffs > 181 wrap to
        # negative squares and a grossly corrupted payload could pass
        # the PSNR gate (found by hypothesis, tests/test_property.py)
        np.multiply(dv, dv, out=sv, dtype=np.int32, casting="unsafe")
        return int(sv.sum(dtype=np.int64))

    def expected_view(self, i: int, w: int, h: int, n: int):
        """Fill exp8[:n] with the default deterministic pattern for row
        index i at dims (w, h): outer-sum synthesis + 8-byte id stamp."""
        np = self.np
        inner = self._inner.get(w)
        if inner is None:
            if len(self._inner) >= 4096:
                self._inner.clear()
            xs = ((np.arange(w, dtype=np.int64) * 3) % 256).astype(np.uint8)
            cs = np.array([0, 17, 34], dtype=np.uint8)
            inner = self._inner[w] = (xs[:, None] + cs[None, :]).reshape(-1)
        ys = self._ys.get(h)
        if ys is None:
            if len(self._ys) >= 4096:
                self._ys.clear()
            ys = self._ys[h] = ((np.arange(h, dtype=np.int64) * 5) % 256) \
                .astype(np.uint8)
        base = np.uint8((i * 2654435761) % 256)
        np.add.outer(ys + base, inner, out=self.exp8[:n].reshape(h, 3 * w))
        ev = self.exp8[:n]
        m = min(8, n)
        ev[:m] = np.frombuffer((i % (1 << 64)).to_bytes(8, "little"),
                               np.uint8)[:m]
        return ev


def payload_violations(
    df: DataFrame,
    spec: PayloadSpec,
    part_key: str | None = None,
    expected_pixels: Callable | None = None,
    check_phash: bool | None = None,
    phash_col: str | None = None,
) -> DataFrame:
    """mapInArrow over ONLY the needed columns; returns violation rows.

    check_phash / phash_col default to the spec's fields
    (PayloadSpec.check_phash et al.); passing them overrides."""
    from ..distribute import ensure_distributed
    ensure_distributed(df.sparkSession)
    if check_phash is None:
        check_phash = getattr(spec, "check_phash", False)
    if phash_col is None:
        phash_col = getattr(spec, "phash_col", "phash")
    phash_exact = getattr(spec, "phash_mode", "exact") == "exact"
    if getattr(spec, "phash_mode", "exact") not in ("exact", "perceptual"):
        raise ValueError(f"phash_mode must be 'exact' or 'perceptual', "
                         f"got {spec.phash_mode!r}")
    phash_ham = int(getattr(spec, "phash_max_hamming", 0))
    cols = [spec.id_col, spec.bytes_col, spec.fmt_col, spec.w_col, spec.h_col]
    if check_phash:
        cols.append(phash_col)
    pk = part_key
    if pk:
        cols.append(pk)
    narrow = df.select(*dict.fromkeys(cols))  # pruned projection

    deep = spec.deep
    check_pixels = spec.check_pixels
    psnr_min = spec.psnr_min
    lossless = set(spec.lossless_fmts)
    gen = expected_pixels
    default_gen = gen is None
    id_c, b_c, f_c, w_c, h_c = (spec.id_col, spec.bytes_col, spec.fmt_col,
                                spec.w_col, spec.h_col)
    # psnr < psnr_min  <=>  mse > 255^2 * 10^(-psnr_min/10) (exact algebra
    # of fakecodec.psnr; the SSE is exact int64, so the comparison is too)
    mse_max = 255.0 * 255.0 * (10.0 ** (-psnr_min / 10.0))

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pyarrow as pa
        scratch = _Scratch()
        for b in batches:
            n = b.num_rows
            ids = b.column(id_c).to_pylist()
            fmts = b.column(f_c).to_pylist()
            ws = b.column(w_c).to_pylist()
            hs = b.column(h_c).to_pylist()
            pks = b.column(pk).to_pylist() if pk else None
            phs = b.column(phash_col).to_pylist() if check_phash else None
            offsets, data, isnull = _binary_views(b.column(b_c))
            out: dict[str, list] = {k: [] for k in
                                    ("row_key", "part_key", "constraint",
                                     "reason", "value", "occurs")}

            def emit(j, c, reason, value):
                out["row_key"].append(str(ids[j]))
                pkv = pks[j] if pks else None
                out["part_key"].append(int(pkv) if pkv is not None else 0)
                out["constraint"].append(c)
                out["reason"].append(reason)
                out["value"].append(str(value)[:200])
                out["occurs"].append(1)

            def emit_pixels(j, lossy, sse, size):
                if not lossy:
                    if sse != 0:
                        emit(j, "payload:pixels",
                             "lossless pixel mismatch vs reference",
                             "exact-compare failed")
                elif sse:
                    mse = sse / size
                    if mse > mse_max:
                        p = 10.0 * math.log10(255.0 * 255.0 / mse)
                        emit(j, "payload:pixels",
                             f"PSNR {p:.1f}dB below {psnr_min:.0f}dB "
                             "vs reference", f"{p:.1f}")

            for j in range(n):
                if isnull is not None and isnull[j]:
                    emit(j, "payload:required",
                         "missing required payload bytes", "NULL")
                    continue
                lo, hi = offsets[j], offsets[j + 1]
                blen = hi - lo
                if blen < 12:
                    emit(j, "payload:decode",
                         "payload does not decode: truncated payload",
                         f"len={blen}")
                    continue
                magic = bytes(data[lo:lo + 4])
                fmt = fakecodec.FMT_OF_MAGIC.get(magic)
                if fmt is None:
                    emit(j, "payload:decode",
                         f"payload does not decode: bad magic {magic!r}",
                         f"len={blen}")
                    continue
                w, h = struct.unpack("<II", data[lo + 4:lo + 12])
                raw = None
                if deep:
                    want = h * w * 3
                    try:
                        raw = zlib.decompress(data[lo + 12:hi],
                                              bufsize=want or 64)
                    except Exception as e:
                        emit(j, "payload:decode",
                             f"payload does not decode: {e}", f"len={blen}")
                        continue
                    if len(raw) != want:
                        emit(j, "payload:decode",
                             "payload does not decode: pixel buffer size "
                             "mismatch", f"len={blen}")
                        continue
                if fmts[j] is not None and fmt != fmts[j]:
                    emit(j, "payload:fmt",
                         f"container format '{fmt}' != metadata fmt "
                         f"'{fmts[j]}'", fmt)
                if (ws[j] is not None and hs[j] is not None
                        and (w != ws[j] or h != hs[j])):
                    emit(j, "payload:dims",
                         f"decoded dims {w}x{h} != metadata {ws[j]}x{hs[j]}",
                         f"{w}x{h}")
                sz = len(raw) if raw is not None else 0
                if deep and check_pixels and sz:
                    lossy = fmt not in lossless
                    a = np.frombuffer(raw, np.uint8)
                    if default_gen:
                        i = _expected_id_index(ids[j])
                        if i is not None:
                            scratch.ensure(sz)
                            ev = scratch.expected_view(i, w, h, sz)
                            emit_pixels(j, lossy, scratch.sse(a, ev), sz)
                    else:
                        exp = gen(ids[j], w, h)
                        if exp is not None:
                            if exp.shape != (h, w, 3):
                                # shape mismatch: exact/psnr parity fails
                                if lossy:
                                    emit(j, "payload:pixels",
                                         f"PSNR 0.0dB below {psnr_min:.0f}dB"
                                         " vs reference", "0.0")
                                else:
                                    emit(j, "payload:pixels",
                                         "lossless pixel mismatch vs "
                                         "reference", "exact-compare failed")
                            else:
                                scratch.ensure(sz)
                                ev = exp.reshape(-1) \
                                        .astype(np.uint8, copy=False)
                                emit_pixels(j, lossy, scratch.sse(a, ev), sz)
                if deep and check_phash and raw is not None \
                        and phs[j] is not None:
                    if phash_exact:
                        # exact content hash: only bit-exact decodes
                        # (lossless containers) can reproduce it; lossy
                        # rows' pixel parity is the PSNR check's job
                        if fmt in lossless:
                            got = fakecodec.stable_hash64_bytes(raw)
                            if int(got) != int(phs[j]):
                                emit(j, "payload:phash",
                                     f"recomputed content hash {got} != "
                                     f"metadata phash {phs[j]}", str(got))
                    else:
                        px = np.frombuffer(raw, np.uint8).reshape(h, w, 3)
                        got = fakecodec.phash64(px)
                        d = bin((int(got) ^ int(phs[j]))
                                & ((1 << 64) - 1)).count("1")
                        if d > phash_ham:
                            emit(j, "payload:phash",
                                 f"recomputed phash {got} at hamming "
                                 f"distance {d} > {phash_ham} from "
                                 f"metadata {phs[j]}", str(got))

            yield pa.RecordBatch.from_pydict(out, schema=_pa_schema())

    return narrow.mapInArrow(run, schema=VIOLATION_SCHEMA)
