"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The dimension probe — the only decode the reference's media job needs
(core.ts:164-191 reads video/image sizes, never pixels) — is REAL and
codec-free for PNG/JPEG/GIF: their (width, height) live in fixed-layout
header fields parsed with pure byte math (``_header_dims``). Other
image formats fall back to Pillow when installed; full pixel decode /
feature extraction would need codec libraries that are NOT in this
container and stays behind ``NotImplementedError``, with a
deterministic fake available for plumbing tests. Also real and tested:

- schema convention: ``content binary`` + ``meta struct<mime,width,...>``
- Arrow-batched ``mapInPandas`` plumbing (batch shape, schema
  threading, partition sizing)
- partition strategy: media rows are large — repartition by byte
  budget before the Python stage so one Arrow batch fits in worker
  memory.

All four pipeline verbs are present: decode/probe (``probe_media``),
resize (``resize_media``), feature-extract (``extract_media_features``
— emits the ``(id, embedding array<float>)`` frame the similarity/
dedup layer consumes directly), and frame-sample
(``frame_sample_plan``). Each pixel/model kernel sits behind an
explicit NotImplementedError boundary with a deterministic fake, so
the distributed plumbing is real and tested in a codec-less container.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "id long, mime string, n_bytes long, sha string, "
    "width int, height int, n_frames int"
)

AV_SCHEMA = (
    "id long, kind string, sample_rate int, channels int, bits int, "
    "timescale int, duration_ms long, width int, height int, n_bytes long"
)


# Formats whose dimensions the pure-Python header probe below parses
# with no codec library: (width, height) live in fixed-layout header
# fields for all three (reference parity: the dimension job in
# core.ts:164-191 needs exactly this, never pixel data).
PURE_HEADER_FORMATS = frozenset(
    {
        "image/png",
        "image/jpeg",
        "image/gif",
        # raw-pixel formats (round 10): dims AND a real resize run
        # with no codec lib at all — see _resize_uncompressed.
        "image/x-portable-pixmap",
        "image/bmp",
    }
)


def _header_dims(b: bytes) -> tuple[int, int] | None:
    """(width, height) from raw image-container headers — PNG IHDR,
    GIF logical screen descriptor, JPEG SOF segment — via pure byte
    math. Returns None when the bytes match none of the three layouts
    (corrupt, truncated, or a different format)."""
    # PNG: 8-byte signature, then the IHDR chunk (len + 'IHDR' + W + H,
    # both 4-byte big-endian) is required to come first by the spec.
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        return (
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    # GIF87a/89a: logical screen W/H as little-endian uint16 at 6/8.
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        return (
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    # JPEG: walk the marker stream from SOI to the first SOF frame
    # header (any of C0-CF except DHT C4 / JPG C8 / DAC CC), which
    # carries precision(1) + height(2) + width(2) big-endian.
    if b[:2] == b"\xff\xd8":
        i, n = 2, len(b)
        while i + 3 < n:
            if b[i] != 0xFF:
                return None
            marker = b[i + 1]
            while marker == 0xFF and i + 2 < n:  # fill bytes
                i += 1
                marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            if marker == 0xD9:  # EOI before any SOF
                return None
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            if seg_len < 2:
                return None
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > n:
                    return None
                return (
                    int.from_bytes(b[i + 7 : i + 9], "big"),
                    int.from_bytes(b[i + 5 : i + 7], "big"),
                )
            i += 2 + seg_len
        return None
    # PPM (P6) and BMP: raw-pixel formats added in round 10 alongside
    # the real stdlib resize path — dims from the same header parse.
    dims = _ppm_dims(b)
    if dims is not None:
        return dims
    return _bmp_dims(b)


# ---------------------------------------------------------------------------
# Uncompressed-format pixel codec (pure stdlib + numpy — NO codec lib).
# PPM (P6) and uncompressed 24-bit BMP carry raw pixels behind a
# fixed-layout header, so a REAL decode→resample→encode round-trip runs
# in this container; compressed formats still require Pillow.
# ---------------------------------------------------------------------------


def _ppm_dims(b: bytes) -> tuple[int, int] | None:
    parsed = _decode_ppm_header(b)
    return None if parsed is None else (parsed[0], parsed[1])


def _decode_ppm_header(b: bytes) -> tuple[int, int, int, int] | None:
    """(width, height, maxval, pixel_offset) of a binary PPM (P6), or
    None. Header = 'P6', then 3 whitespace-separated ints with
    '#'-comment support, then ONE whitespace byte before pixel data."""
    if b[:2] != b"P6":
        return None
    i, n, vals = 2, len(b), []
    while len(vals) < 3 and i < n:
        c = b[i : i + 1]
        if c == b"#":  # comment to end of line
            while i < n and b[i] not in (0x0A, 0x0D):
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < n and b[j : j + 1].isdigit():
                j += 1
            vals.append(int(b[i:j]))
            i = j
        else:
            return None
    if len(vals) < 3 or i >= n or not b[i : i + 1].isspace():
        return None
    w, h, maxval = vals
    if w <= 0 or h <= 0 or not 0 < maxval < 256:
        return None
    return (w, h, maxval, i + 1)


def _bmp_dims(b: bytes) -> tuple[int, int] | None:
    if b[:2] != b"BM" or len(b) < 26:
        return None
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    if w <= 0 or h == 0:
        return None
    return (w, abs(h))


def _nn_resample(arr, width: int, height: int):
    """Deterministic nearest-neighbor resample of an (H, W, 3) array:
    source index = floor(dst * src_len / dst_len) — integer math only,
    so the expected pixels are reproducible in any runtime."""
    import numpy as np

    in_h, in_w = arr.shape[0], arr.shape[1]
    ys = (np.arange(height) * in_h) // height
    xs = (np.arange(width) * in_w) // width
    return arr[ys][:, xs]


def _resize_uncompressed(c: bytes, width: int, height: int) -> bytes | None:
    """REAL resize for the two raw-pixel formats, entirely in
    stdlib+numpy; None when the bytes are neither (caller falls back
    to the Pillow-gated path). Output re-encodes in the input's own
    format."""
    import numpy as np

    ppm = _decode_ppm_header(c)
    if ppm is not None:
        w, h, maxval, off = ppm
        need = off + w * h * 3
        if len(c) < need:
            return None
        arr = np.frombuffer(c[off:need], dtype=np.uint8).reshape(h, w, 3)
        out = _nn_resample(arr, width, height)
        return b"P6\n%d %d\n%d\n" % (width, height, maxval) + out.tobytes()
    if c[:2] == b"BM" and len(c) >= 54:
        pix_off = int.from_bytes(c[10:14], "little")
        w = int.from_bytes(c[18:22], "little", signed=True)
        h = int.from_bytes(c[22:26], "little", signed=True)
        bpp = int.from_bytes(c[28:30], "little")
        compression = int.from_bytes(c[30:34], "little")
        if bpp != 24 or compression != 0 or w <= 0 or h == 0:
            return None  # compressed / paletted BMP → codec-lib path
        top_down = h < 0
        ah = abs(h)
        stride = ((w * 3 + 3) // 4) * 4
        if len(c) < pix_off + stride * ah:
            return None
        rows = np.frombuffer(
            c[pix_off : pix_off + stride * ah], dtype=np.uint8
        ).reshape(ah, stride)[:, : w * 3].reshape(ah, w, 3)
        if not top_down:
            rows = rows[::-1]
        out = _nn_resample(rows, width, height)
        out_stride = ((width * 3 + 3) // 4) * 4
        pad = out_stride - width * 3
        body = bytearray()
        for r in range(height - 1, -1, -1):  # re-encode bottom-up
            body += out[r].tobytes() + b"\x00" * pad
        img_size = out_stride * height
        header = (
            b"BM"
            + (54 + img_size).to_bytes(4, "little")
            + b"\x00\x00\x00\x00"
            + (54).to_bytes(4, "little")
            + (40).to_bytes(4, "little")
            + width.to_bytes(4, "little", signed=True)
            + height.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little")
            + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little")
            + img_size.to_bytes(4, "little")
            + (2835).to_bytes(4, "little") * 2
            + (0).to_bytes(4, "little") * 2
        )
        return bytes(header) + bytes(body)
    return None


def _decode_image(content: bytes) -> tuple[int, int]:
    """Real decoder: the pure header probe first (PNG/JPEG/GIF — no
    codec lib at all), then a Pillow-backed probe for every other image
    format when the optional dependency is installed (imported inside
    the worker function so only that fallback needs it). Raises
    NotImplementedError when neither can handle the bytes AND Pillow is
    absent, so the codec-lib boundary stays explicit. ``Image.open``
    reads only the header for size, so even the fallback does NOT
    decompress the full pixel buffer."""
    dims = _header_dims(content)
    if dims is not None:
        return dims
    try:
        import io

        from PIL import Image
    except ImportError as exc:  # container has no codec libs
        raise NotImplementedError(
            "image decode beyond PNG/JPEG/GIF headers requires codec "
            "libs (e.g. Pillow)"
        ) from exc
    with Image.open(io.BytesIO(content)) as im:
        return (im.width, im.height)


def _fake_probe(content: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: derive (width, height,
    n_frames) from content bytes so plumbing tests have stable
    expectations."""
    if not content:
        return (0, 0, 0)
    w = 16 + (content[0] % 64) * 16
    h = 16 + (content[-1] % 64) * 16
    frames = 1 + (len(content) % 7)
    return (w, h, frames)


def _wav_info(b: bytes) -> tuple[int, int, int, int] | None:
    """(sample_rate, channels, bits_per_sample, duration_ms) from
    RIFF/WAVE chunk headers — pure byte math, no audio lib. Walks the
    word-aligned chunk list for ``fmt `` (rate/channels/bits/byte-rate)
    and ``data`` (payload size); duration_ms is the exact integer
    ``data_size * 1000 // byte_rate``. Only the HEADERS need to be
    present: the walk reads size fields and skips payloads, so a
    truncated capture (or a fixture with a claimed-but-absent data
    payload) still probes. Returns None for non-WAV bytes or a chunk
    list missing fmt/data — the reference's media-dimension job intent
    (core.ts:164-191) applied to audio."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, n = 12, len(b)
    rate = ch = bits = byte_rate = data_size = None
    while i + 8 <= n:
        cid = b[i : i + 4]
        csz = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 24 <= n:
            ch = int.from_bytes(b[i + 10 : i + 12], "little")
            rate = int.from_bytes(b[i + 12 : i + 16], "little")
            byte_rate = int.from_bytes(b[i + 16 : i + 20], "little")
            bits = int.from_bytes(b[i + 22 : i + 24], "little")
        elif cid == b"data":
            data_size = csz
        i += 8 + csz + (csz & 1)  # chunks are word-aligned
    if rate is None or data_size is None or not byte_rate:
        return None
    return rate, ch or 0, bits or 0, (data_size * 1000) // byte_rate


def _mp4_boxes(b: bytes, start: int, end: int):
    """Yield (type, body_start, box_end) for the ISO-BMFF box list in
    b[start:end]. Stops on a malformed size rather than guessing."""
    i = start
    while i + 8 <= end:
        sz = int.from_bytes(b[i : i + 4], "big")
        if sz < 8 or i + sz > end:
            return
        yield b[i + 4 : i + 8], i + 8, i + sz
        i += sz


def _mp4_info(b: bytes) -> tuple[int, int, int, int] | None:
    """(timescale, duration_ms, width, height) from the moov/mvhd box
    (and the first trak/tkhd when present) of an ISO-BMFF (MP4/MOV)
    stream — pure big-endian byte math over box headers, version-0
    boxes (the 32-bit layout every muxer emits for sub-68-year
    timestamps). width/height are tkhd's 16.16 fixed point, returned
    as integer pixels (audio-only files have no trak with nonzero
    dims → 0). duration_ms = duration * 1000 // timescale, exact."""
    if len(b) < 8:
        return None
    timescale = duration = None
    width = height = 0
    for typ, bs, be in _mp4_boxes(b, 0, len(b)):
        if typ != b"moov":
            continue
        for t2, b2, e2 in _mp4_boxes(b, bs, be):
            if t2 == b"mvhd" and b2 + 20 <= e2 and b[b2] == 0:
                timescale = int.from_bytes(b[b2 + 12 : b2 + 16], "big")
                duration = int.from_bytes(b[b2 + 16 : b2 + 20], "big")
            elif t2 == b"trak" and not (width or height):
                for t3, b3, e3 in _mp4_boxes(b, b2, e2):
                    if t3 == b"tkhd" and b3 + 84 <= e3 and b[b3] == 0:
                        width = int.from_bytes(b[b3 + 76 : b3 + 80], "big") >> 16
                        height = int.from_bytes(b[b3 + 80 : b3 + 84], "big") >> 16
    if not timescale or duration is None:
        return None
    return timescale, (duration * 1000) // timescale, width, height


def probe_av(
    df: DataFrame,
    *,
    id_col: str = "id",
    content_col: str = "content",
    target_partition_bytes: int | None = 128 << 20,
    estimated_bytes: int | None = None,
) -> DataFrame:
    """Audio/video header probe: WAV (RIFF fmt/data chunks) and MP4
    (moov/mvhd + tkhd boxes), codec-free — the AV siblings of
    probe_media's image probe, same Arrow mapInPandas plumbing and the
    same byte-budget partitioning (media rows are large; a partition
    is an Arrow batch is a Python worker's memory).

    Returns AV_SCHEMA rows: kind ∈ {'wav','mp4','unknown'}; fields the
    format doesn't carry are 0 (wav: timescale/width/height; mp4:
    sample_rate/channels/bits), and an unparseable blob is
    kind='unknown' with all-zero fields rather than a task failure —
    one bad blob must not fail a 100 TB job."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = [
                bytes(c) if c is not None else b"" for c in pdf[content_col]
            ]
            rows = []
            for c in contents:
                w = _wav_info(c)
                if w is not None:
                    rows.append(("wav", w[0], w[1], w[2], 0, w[3], 0, 0))
                    continue
                m = _mp4_info(c)
                if m is not None:
                    rows.append(("mp4", 0, 0, 0, m[0], m[1], m[2], m[3]))
                    continue
                rows.append(("unknown", 0, 0, 0, 0, 0, 0, 0))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "kind": [r[0] for r in rows],
                    "sample_rate": [r[1] for r in rows],
                    "channels": [r[2] for r in rows],
                    "bits": [r[3] for r in rows],
                    "timescale": [r[4] for r in rows],
                    "duration_ms": [r[5] for r in rows],
                    "width": [r[6] for r in rows],
                    "height": [r[7] for r in rows],
                    "n_bytes": [len(c) for c in contents],
                }
            )

    src = df.select(id_col, content_col)
    if target_partition_bytes is not None:
        n = _byte_budget_partitions(
            src, content_col, target_partition_bytes, estimated_bytes
        )
        src = src.repartition(n)
    return src.mapInPandas(kernel, schema=AV_SCHEMA)


def _dhash_ppm(b: bytes, *, grid: int = 8) -> int | None:
    """Difference hash (dHash) of a binary PPM image — the standard
    perceptual near-dup signature, codec-free: grayscale the pixels
    (integer mean of r,g,b), nearest-neighbor resample to a
    grid×grid luminance grid (the _nn_resample floor mapping
    ``src = (dst * src_dim) // dst_dim``), then one bit per
    horizontally-adjacent pair: bit(y,x) = g[y][x+1] > g[y][x],
    packed row-major at index y*(grid-1)+x — grid=8 gives 56 bits,
    deliberately inside a signed 64-bit int so cross-engine shifts
    never overflow. Returns None for non-PPM/corrupt bytes."""
    hdr = _decode_ppm_header(b)
    if hdr is None:
        return None
    w, h, _maxval, off = hdr
    if len(b) < off + 3 * w * h:
        return None
    g = grid
    out = 0
    for y in range(g):
        sy = (y * h) // g
        row = []
        for x in range(g):
            sx = (x * w) // g
            p = off + 3 * (sy * w + sx)
            row.append((b[p] + b[p + 1] + b[p + 2]) // 3)
        for x in range(g - 1):
            if row[x + 1] > row[x]:
                out |= 1 << (y * (g - 1) + x)
    return out


def _wav_pcm_fingerprint(b: bytes, *, frames: int = 16) -> int | None:
    """Energy-envelope fingerprint of a PCM WAV — the audio sibling of
    ``_dhash_ppm``, codec-free for the formats a container without
    audio libs can actually decode: uncompressed PCM (fmt tag 1) at 8
    or 16 bits. The payload splits into ``frames+1`` equal windows by
    the floor mapping; window energy = integer sum of sample
    magnitudes; bit w = energy[w+1] > energy[w] — loudness-scale
    invariant like dHash's brightness invariance, and ``frames`` bits
    pack into a BIGINT for the same Hamming-LSH near-dup machinery
    (``dhash_near_dup_counts`` takes the column name and bit width).
    Channels are left interleaved: energy sums are channel-agnostic.
    Returns None for non-WAV, non-PCM, truncated-payload, or
    fewer-samples-than-windows input."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, n = 12, len(b)
    fmt_tag = bits = None
    data_off = data_size = None
    while i + 8 <= n:
        cid = b[i : i + 4]
        csz = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 24 <= n:
            fmt_tag = int.from_bytes(b[i + 8 : i + 10], "little")
            bits = int.from_bytes(b[i + 22 : i + 24], "little")
        elif cid == b"data":
            data_off, data_size = i + 8, csz
        i += 8 + csz + (csz & 1)
    if fmt_tag != 1 or bits not in (8, 16) or data_off is None:
        return None
    avail = min(data_size, len(b) - data_off)
    step = bits // 8
    ns = avail // step
    if ns < frames + 1:
        return None
    energies = []
    for w in range(frames + 1):
        lo = (w * ns) // (frames + 1)
        hi = ((w + 1) * ns) // (frames + 1)
        e = 0
        for s in range(lo, hi):
            p = data_off + s * step
            if bits == 8:
                e += abs(b[p] - 128)
            else:
                e += abs(int.from_bytes(b[p : p + 2], "little", signed=True))
        energies.append(e)
    out = 0
    for w in range(frames):
        if energies[w + 1] > energies[w]:
            out |= 1 << w
    return out


def audio_fingerprints(
    df: DataFrame,
    *,
    id_col: str = "id",
    content_col: str = "content",
    frames: int = 16,
    target_partition_bytes: int | None = 128 << 20,
    estimated_bytes: int | None = None,
) -> DataFrame:
    """Per-clip PCM energy fingerprints via mapInPandas (the probe_av
    plumbing). Returns (id, afp, ok); undecodable clips get ok=false,
    afp=0. Feed the output to ``dhash_near_dup_counts(hash_col='afp',
    bits=frames, ...)`` for audio near-dup."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps, oks = [], []
            for c in pdf[content_col]:
                v = (
                    _wav_pcm_fingerprint(bytes(c), frames=frames)
                    if c is not None
                    else None
                )
                fps.append(0 if v is None else v)
                oks.append(v is not None)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "afp": fps,
                    "ok": oks,
                }
            )

    src = df.select(id_col, content_col)
    if target_partition_bytes is not None:
        n = _byte_budget_partitions(
            src, content_col, target_partition_bytes, estimated_bytes
        )
        src = src.repartition(n)
    return src.mapInPandas(kernel, schema="id long, afp long, ok boolean")


def dhash_images(
    df: DataFrame,
    *,
    id_col: str = "id",
    content_col: str = "content",
    grid: int = 8,
    target_partition_bytes: int | None = 128 << 20,
    estimated_bytes: int | None = None,
) -> DataFrame:
    """Per-image perceptual signatures via mapInPandas (same Arrow +
    byte-budget plumbing as probe_media/probe_av). Returns
    (id, dhash, ok); corrupt/non-PPM blobs get ok=false, dhash=0 —
    never a task failure."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes, oks = [], []
            for c in pdf[content_col]:
                hv = _dhash_ppm(bytes(c), grid=grid) if c is not None else None
                hashes.append(0 if hv is None else hv)
                oks.append(hv is not None)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "dhash": hashes,
                    "ok": oks,
                }
            )

    src = df.select(id_col, content_col)
    if target_partition_bytes is not None:
        n = _byte_budget_partitions(
            src, content_col, target_partition_bytes, estimated_bytes
        )
        src = src.repartition(n)
    return src.mapInPandas(kernel, schema="id long, dhash long, ok boolean")


def dhash_near_dup_counts(
    hashes: DataFrame,
    *,
    id_col: str = "id",
    hash_col: str = "dhash",
    max_hamming: int = 4,
    n_bands: int = 4,
    bits: int = 56,
    bucket_cap: int | None = None,
    ok_col: str | None = "ok",
) -> DataFrame:
    """Per-image near-duplicate mass under Hamming distance over the
    dHash signatures — image dedup joined to the text-dedup playbook:

    - DISTINCT-hash pre-collapse first (the LSH digest-canonical
      guard): exact-duplicate images share a signature, so the pair
      stage runs on distinct signatures weighted by class size, never
      on rows.
    - Candidate pairs via Hamming LSH banding: the ``bits``-bit hash
      splits into ``n_bands`` contiguous bands; two hashes within
      Hamming distance < n_bands MUST share an exact band
      (pigeonhole), so an equi-join on (band_idx, band_value) finds
      every pair at distance <= n_bands-1 — and with the default
      max_hamming=4 > 3 the band join is a documented-recall candidate
      generator for the 4s (the standard banding trade; raise n_bands
      for exact recall at higher distances).
    - Verification is exact: bit_count(xor) <= max_hamming, identical
      in DuckDB.

    Returns (id, dhash, n_near_dups): for each image, how many OTHER
    images lie within max_hamming (same-signature twins counted via
    class size). Shuffles touch distinct signatures only.

    ``ok_col`` (default "ok", the column dhash_images /
    audio_fingerprints emit): rows where it is false are DROPPED before
    anything else — undecodable blobs carry the sentinel hash 0, and
    left in they would form one giant exact-duplicate class (and
    band-match real hashes near 0), inflating every count. Pass
    ``ok_col=None`` only for inputs that are all decodable by
    construction; a named column that is absent raises (silently
    skipping the guard is how the sentinel class sneaks back in).

    ``bucket_cap`` guards the one quadratic hazard (the
    semantic_dup_flags cap, ported): the distinct-signature
    pre-collapse bounds exact twins, but a corpus with millions of
    DISTINCT low-gradient hashes sharing a band value (all-black
    thumbnails, silence-heavy clips) still goes m·(m-1)/2 in that
    (bi, bv) bucket. Buckets with more than ``bucket_cap`` distinct
    signatures are dropped from candidate generation — a documented
    recall trade, never silent: audit with ``dhash_bucket_stats``
    before choosing the cap (an over-cap bucket is a near-certain
    duplicate cluster; route its members to exact dedup instead).
    Default ``None`` (no cap) keeps the library behavior explicit at
    call sites, exactly like semantic_dup_flags. The member-count
    window shuffles on the same (bi, bv) key the self-join needs, so
    both join sides reuse the windowed exchange.
    """
    from pyspark.sql import Window

    if bits % n_bands:
        raise ValueError(
            f"bits ({bits}) must divide evenly into n_bands ({n_bands}): "
            "a remainder would leave the top bits out of every band and "
            "silently shrink candidate recall"
        )
    if ok_col is not None:
        if ok_col not in hashes.columns:
            raise ValueError(
                f"ok_col {ok_col!r} not in input (columns: "
                f"{hashes.columns}); pass ok_col=None only when every "
                "row is decodable by construction"
            )
        hashes = hashes.filter(F.col(ok_col))
    classes = (
        hashes.groupBy(F.col(hash_col).alias("_h"))
        .agg(F.count(F.lit(1)).cast("long").alias("_csz"))
        .localCheckpoint()  # feeds bands twice + the final map-back
    )
    band_w = bits // n_bands
    mask = (1 << band_w) - 1
    bands = classes.select(
        "_h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("bi"),
                        F.shiftright(F.col("_h"), i * band_w)
                        .bitwiseAND(F.lit(mask))
                        .alias("bv"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("_b"),
    ).select("_h", F.col("_b.bi").alias("bi"), F.col("_b.bv").alias("bv"))
    if bucket_cap is not None:
        wb = Window.partitionBy("bi", "bv")
        bands = (
            bands.withColumn("_m", F.count(F.lit(1)).over(wb))
            .filter(F.col("_m") <= bucket_cap)
            .drop("_m")
        )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a._h") < F.col("b._h")),
        )
        .select(F.col("a._h").alias("ha"), F.col("b._h").alias("hb"))
        .distinct()
    )
    verified = cand.filter(
        F.bit_count(
            F.col("ha").bitwiseXOR(F.col("hb"))
        )
        <= max_hamming
    )
    # neighbor mass per distinct hash: cross-class partners' sizes
    # (both directions) + own class twins (csz - 1)
    part = verified.select(
        F.col("ha").alias("_h"), F.col("hb").alias("_p")
    ).unionByName(
        verified.select(F.col("hb").alias("_h"), F.col("ha").alias("_p"))
    )
    cross = (
        part.join(
            classes.select(
                F.col("_h").alias("_p"), F.col("_csz").alias("_psz")
            ),
            "_p",
        )
        .groupBy("_h")
        .agg(F.sum("_psz").cast("long").alias("_cross"))
    )
    mass = classes.join(cross, "_h", "left").select(
        "_h",
        (
            F.col("_csz") - 1 + F.coalesce(F.col("_cross"), F.lit(0))
        ).cast("long").alias("n_near_dups"),
    )
    return hashes.select(F.col(id_col), F.col(hash_col)).join(
        mass, F.col(hash_col) == F.col("_h")
    ).select(F.col(id_col), F.col(hash_col), "n_near_dups")


def dhash_bucket_stats(
    hashes: DataFrame,
    *,
    hash_col: str = "dhash",
    n_bands: int = 4,
    bits: int = 56,
    ok_col: str | None = "ok",
) -> DataFrame:
    """(bi, bv, n_members, n_rows) histogram of dhash_near_dup_counts'
    candidate buckets — the semantic_bucket_stats analog for the
    Hamming-LSH path. ``n_members`` counts DISTINCT signatures (the
    join's pair driver: a ``bucket_cap`` c drops Σ over buckets with
    n_members > c of n·(n-1)/2 candidate pairs); ``n_rows`` is the
    underlying image/clip mass those signatures carry (what the
    dropped pairs would have counted). Run before choosing the cap and
    log the over-cap mass; same banding + ok-filter semantics as the
    counter so the histogram describes exactly the join it audits."""
    if bits % n_bands:
        raise ValueError(f"bits ({bits}) must divide into n_bands ({n_bands})")
    if ok_col is not None:
        if ok_col not in hashes.columns:
            raise ValueError(f"ok_col {ok_col!r} not in input")
        hashes = hashes.filter(F.col(ok_col))
    classes = hashes.groupBy(F.col(hash_col).alias("_h")).agg(
        F.count(F.lit(1)).cast("long").alias("_csz")
    )
    band_w = bits // n_bands
    mask = (1 << band_w) - 1
    bands = classes.select(
        "_h",
        "_csz",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("bi"),
                        F.shiftright(F.col("_h"), i * band_w)
                        .bitwiseAND(F.lit(mask))
                        .alias("bv"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("_b"),
    ).select("_csz", F.col("_b.bi").alias("bi"), F.col("_b.bv").alias("bv"))
    return bands.groupBy("bi", "bv").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("_csz").cast("long").alias("n_rows"),
    )


def _byte_budget_partitions(
    df: DataFrame, content_col: str, target_partition_bytes: int,
    estimated_bytes: int | None = None,
) -> int:
    """Partition count so each partition carries ~target bytes. Order
    of preference: (1) caller-supplied ``estimated_bytes`` (no scan, no
    py4j — works under Spark Connect); (2) the optimizer's sizeInBytes
    statistic (parquet footers / file sizes — free, no data scan; needs
    the classic py4j ``_jdf`` handle, so it's wrapped in try/except);
    (3) an exact sum(length(content)) aggregate — one extra pass over
    the blob column, last resort for stats-less in-memory relations or
    Connect sessions. Media rows are large; one oversized partition is
    one oversized Arrow batch and an OOM'd Python worker, so partitions
    are sized by bytes, not row count.

    Caveat: for file-backed sources the statistic is the COMPRESSED
    size. Real media blobs (jpeg/mp4/opus payloads) are already
    entropy-coded so parquet adds ~nothing and file bytes ≈ in-memory
    bytes; for compressible binary, tune
    spark.sql.sources.fileCompressionFactor upward."""
    est = estimated_bytes
    if est is None:
        try:  # classic py4j only; absent under Spark Connect
            est = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:
            est = None
        if est is not None and est >= (1 << 62):  # "unknown" sentinel
            est = None
    if est is None:
        est = (
            df.agg(
                F.sum(F.coalesce(F.length(F.col(content_col)), F.lit(0)))
            ).first()[0]
            or 0
        )
    return max(1, min(-(-est // target_partition_bytes), 1 << 20))


def probe_media(df: DataFrame, *, id_col: str = "id", content_col: str = "content",
                mime_col: str = "mime", use_fake_decoder: bool = False,
                target_partition_bytes: int | None = 128 << 20,
                estimated_bytes: int | None = None,
                isolate_oversized: bool = False) -> DataFrame:
    """Extract media metadata with mapInPandas (Arrow batches).

    The input is repartitioned to ceil(estimated_bytes /
    ``target_partition_bytes``) partitions first, bounding the bytes
    any single Python worker materializes (pass ``None`` to keep the
    incoming partitioning, e.g. when the caller already bucketed by
    byte budget). ``estimated_bytes`` lets callers who know the corpus
    size skip both the stats lookup and the fallback length() scan.
    Per-batch work is column-wise over the pandas frame — the only
    per-element Python is the probe/sha kernel itself, which is
    inherently per-blob.

    The default round-robin repartition(n) bounds partition bytes only
    IN EXPECTATION: with many comparably-sized rows the deviation
    averages out, but a single multi-GB video among thumbnails can blow
    one partition far past the target — the exact OOM this budget
    exists to prevent. For mixed-size corpora pass
    ``isolate_oversized=True``: rows with length(content) >= target
    split into their own arm, range-partitioned on ``id_col`` into ~1
    row per partition (such rows exceed any budget alone and must be
    isolated regardless); the small-row arm keeps the round-robin,
    where per-partition overshoot is now bounded by the largest small
    row (< target, so < 2x target per partition). Cost: the size filter
    evaluates in both arms' scans (two passes over the source), which
    is why strict mode is opt-in rather than the default.

    The default is the REAL image kernel: PNG/JPEG/GIF dimensions come
    from the pure header probe (no codec lib), other image formats from
    Pillow when installed. Non-image mimes, empty, and corrupt blobs
    yield (0, 0, 0) rather than failing the task — one bad blob must
    not fail a 100 TB job. An unparseable blob whose mime claims a
    pure-header format (PNG/JPEG/GIF) counts as corrupt; an unparseable
    blob of any OTHER image format in a Pillow-less container raises
    NotImplementedError — that's a missing-codec configuration error,
    which IS a whole-job error. ``use_fake_decoder=True`` keeps the
    deterministic fake for plumbing tests."""
    import hashlib

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = [
                bytes(c) if c is not None else b"" for c in pdf[content_col]
            ]
            if use_fake_decoder:
                dims = [_fake_probe(c) for c in contents]
            else:
                dims = []
                for c, mime in zip(contents, pdf[mime_col]):
                    if not c or not str(mime).startswith("image/"):
                        dims.append((0, 0, 0))
                        continue
                    try:
                        dims.append((*_decode_image(c), 1))
                    except NotImplementedError:
                        # no codec lib: corrupt-of-supported-format is
                        # data (0,0,0); unsupported format is config.
                        if str(mime) in PURE_HEADER_FORMATS:
                            dims.append((0, 0, 0))
                        else:
                            raise
                    except Exception:
                        dims.append((0, 0, 0))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "mime": pdf[mime_col].to_numpy(),
                    "n_bytes": [len(c) for c in contents],
                    "sha": [hashlib.sha256(c).hexdigest() for c in contents],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    src = df.select(id_col, content_col, mime_col)
    if target_partition_bytes is not None:
        n = _byte_budget_partitions(
            src, content_col, target_partition_bytes, estimated_bytes
        )
        if isolate_oversized:
            sz = F.coalesce(F.length(F.col(content_col)), F.lit(0))
            big = src.filter(sz >= F.lit(target_partition_bytes))
            small = src.filter(sz < F.lit(target_partition_bytes))
            # Each oversized row is >= target, so there are at most n of
            # them: n range partitions on the distinct id give ~1 blob
            # per partition without a count() pass. union() of the two
            # repartitioned arms is narrow (no re-shuffle) — mapInPandas
            # sees the arms' partitions side by side.
            src = small.repartition(n).unionByName(
                big.repartitionByRange(n, F.col(id_col))
            )
        else:
            src = src.repartition(n)
    return src.mapInPandas(probe, schema=MEDIA_SCHEMA)


def frame_sample_plan(df: DataFrame, *, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to
    extract. The expansion is pure column math (no decode); the decode
    itself would run in a downstream mapInPandas like probe_media."""
    return df.select(
        "id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )


RESIZED_SCHEMA = "id long, mime string, width int, height int, content binary"


def resize_media(
    df: DataFrame, *, width: int, height: int, id_col: str = "id",
    content_col: str = "content", mime_col: str = "mime",
    use_fake_kernel: bool = False,
    target_partition_bytes: int | None = 128 << 20,
    estimated_bytes: int | None = None,
) -> DataFrame:
    """Image resize as an Arrow-batched mapInPandas stage over the same
    byte-budget partitioning as probe_media (resize reads AND writes
    whole blobs, so the per-partition byte bound matters twice).

    The pixel kernel itself sits behind the codec-lib boundary: with
    Pillow installed the real resize runs (imported inside the worker
    fn); without it, ``use_fake_kernel=True`` substitutes a
    deterministic stand-in (md5-derived bytes tagged with the target
    dims) so the Spark-side plumbing — schema, batch shape, partition
    sizing, NULL handling — is fully testable in this container, and
    the default raises NotImplementedError (a missing-codec
    configuration error, not data). NULL/empty blobs pass through as
    empty output blobs rather than failing the task."""
    import hashlib

    def _resize_real(c: bytes) -> bytes:
        # Raw-pixel formats (PPM/BMP) resize for real with stdlib +
        # numpy — no codec lib; compressed formats need Pillow and the
        # boundary stays explicit.
        raw = _resize_uncompressed(c, width, height)
        if raw is not None:
            return raw
        try:
            import io

            from PIL import Image
        except ImportError as exc:
            raise NotImplementedError(
                "resize of compressed formats requires codec libs "
                "(e.g. Pillow); PPM/BMP resize runs without them"
            ) from exc
        with Image.open(io.BytesIO(c)) as im:
            out = io.BytesIO()
            im.resize((width, height)).save(out, format=im.format or "PNG")
            return out.getvalue()

    def _resize_fake(c: bytes) -> bytes:
        return hashlib.md5(c).digest() + f"{width}x{height}".encode()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = [
                bytes(c) if c is not None else b"" for c in pdf[content_col]
            ]
            out = []
            for c in contents:
                if not c:
                    out.append(b"")
                elif use_fake_kernel:
                    out.append(_resize_fake(c))
                else:
                    out.append(_resize_real(c))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "mime": pdf[mime_col].to_numpy(),
                    "width": [width] * len(out),
                    "height": [height] * len(out),
                    "content": out,
                }
            )

    src = df.select(id_col, content_col, mime_col)
    if target_partition_bytes is not None:
        n = _byte_budget_partitions(
            src, content_col, target_partition_bytes, estimated_bytes
        )
        src = src.repartition(n)
    return src.mapInPandas(kernel, schema=RESIZED_SCHEMA)


def extract_media_features(
    df: DataFrame, *, dim: int = 16, id_col: str = "id",
    content_col: str = "content", use_fake_kernel: bool = False,
    target_partition_bytes: int | None = 128 << 20,
    estimated_bytes: int | None = None,
) -> DataFrame:
    """Media feature extraction (the embed step of an image/audio
    pipeline) as mapInPandas → ``(id, embedding array<float>)`` —
    shaped to feed the similarity/dedup operators directly
    (quantize_int8, semantic_dup_flags, ann_lsh all take this frame).

    A real encoder is a model runtime this container doesn't ship, so
    the default raises NotImplementedError at the kernel seam;
    ``use_fake_kernel=True`` derives ``dim`` deterministic floats in
    [0, 1] from the blob's sha256 — stable across engines and runs, so
    plumbing and downstream-integration tests have exact expectations.
    NULL/empty blobs emit a NULL embedding (the similarity layer's
    documented NULL-exclusion contract picks them up)."""
    import hashlib

    if dim > 32:
        raise ValueError("fake kernel derives at most 32 floats (sha256)")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for c in pdf[content_col]:
                b = bytes(c) if c is not None else b""
                if not b:
                    embs.append(None)
                    continue
                if not use_fake_kernel:
                    raise NotImplementedError(
                        "media feature extraction requires a model "
                        "runtime; pass use_fake_kernel=True for "
                        "plumbing tests"
                    )
                digest = hashlib.sha256(b).digest()
                embs.append([round(x / 255.0, 6) for x in digest[:dim]])
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(), "embedding": embs}
            )

    src = df.select(id_col, content_col)
    if target_partition_bytes is not None:
        n = _byte_budget_partitions(
            src, content_col, target_partition_bytes, estimated_bytes
        )
        src = src.repartition(n)
    return src.mapInPandas(kernel, schema="id long, embedding array<float>")
