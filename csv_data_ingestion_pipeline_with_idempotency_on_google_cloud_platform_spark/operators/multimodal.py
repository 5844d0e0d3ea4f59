"""Multimodal column plumbing — extension X5 (SURVEY.md §2b).

Design: image/audio/video payloads are opaque `binary` columns with
typed metadata travelling alongside. The Spark-side plumbing — schema,
Arrow-batched `mapInPandas` UDF signatures, partition-sized batches —
is real and tested. `decode_media` is the decode seam: PGM/PPM images
and PCM WAV audio decode for real (numpy + stdlib, executed in tests
on generated fixture bytes); other image formats go through PIL when
installed (optional import); types with no decoder raise
`NotImplementedError`, and feature passes degrade to a deterministic
fake feature extractor so mixed-modality tables still process.

At 100 TB: binary payloads ride in Parquet alongside metadata, the
decode/feature pass is `mapInPandas` (one Arrow batch per ~10k rows, no
per-row Python overhead), and partitioning is by size so a batch of
large videos doesn't OOM an executor (`repartitionByRange` on
byte_len).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..utils import parallelize_narrow

MEDIA_META_DDL = "doc_id BIGINT, media_type STRING, byte_len BIGINT, sha256_16 STRING"
MEDIA_FEATURE_DDL = MEDIA_META_DDL + ", feature ARRAY<DOUBLE>"
FRAME_DDL = "doc_id BIGINT, frame_idx INT, frame_offset BIGINT, frame BINARY"


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in media table: utf-8 bytes of `text` as the opaque payload.

    Real deployments read `spark.read.format('binaryFile')` or Parquet
    with a binary column; the downstream plumbing is identical.
    NULL-text documents are dropped here (no bytes → no media row):
    downstream batch decoders call bytes(payload) and would crash on a
    NULL payload, while the DuckDB oracles silently skip NULL hashes —
    filtering at the source keeps both engines agreeing.
    """
    return docs.where(F.col(text_col).isNotNull()).select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def _decode_pnm(raw: bytes):
    """Decode binary Netpbm images — P5 (grayscale PGM) and P6 (RGB
    PPM) — with numpy only. Returns (h, w) or (h, w, 3) uint8/uint16."""
    import numpy as np

    if raw[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM payload")
    # header: magic, then width/height/maxval tokens separated by
    # whitespace, with '#' comments allowed between tokens
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if raw[pos : pos + 1] == b"#":
            while pos < len(raw) and raw[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(raw[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    width, height, maxval = tokens
    channels = 3 if raw[:2] == b"P6" else 1
    dtype = np.dtype(">u2") if maxval > 255 else np.uint8
    count = width * height * channels
    arr = np.frombuffer(raw, dtype=dtype, count=count, offset=pos)
    shape = (height, width, 3) if channels == 3 else (height, width)
    return arr.reshape(shape)


def _decode_wav(raw: bytes):
    """Decode a PCM WAV payload with stdlib `wave` + numpy. Returns
    (n_frames, n_channels) int16/int32/uint8 samples."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(raw), "rb") as w:
        n, ch, width = w.getnframes(), w.getnchannels(), w.getsampwidth()
        frames = w.readframes(n)
    dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}[width]
    return np.frombuffer(frames, dtype=dtype).reshape(n, ch)


def decode_media(payload: bytes, media_type: str):
    """Decode a media payload to a numpy array — the single seam where
    decoders plug into the Arrow-batched passes around it.

    Executable in this container (numpy + stdlib, no media libs):
    - image/x-portable-graymap, image/x-portable-pixmap → pixel array
    - audio/x-wav, audio/wav → (frames, channels) sample array

    Optional-import path: any other image/* type goes through PIL when
    it is installed. Types with no available decoder raise
    `NotImplementedError` — callers that can degrade (real_features)
    fall back to the deterministic fake; callers that cannot should
    let it propagate.
    """
    raw = bytes(payload)
    if media_type in ("image/x-portable-graymap", "image/x-portable-pixmap"):
        return _decode_pnm(raw)
    if media_type in ("audio/x-wav", "audio/wav"):
        return _decode_wav(raw)
    if media_type.startswith("image/"):
        try:
            import io

            import numpy as np
            from PIL import Image  # optional dependency
        except ImportError as ex:
            raise NotImplementedError(
                f"decoding {media_type} requires PIL, which is not "
                "installed in this environment"
            ) from ex
        return np.asarray(Image.open(io.BytesIO(raw)))
    raise NotImplementedError(f"no decoder available for {media_type}")


def real_features(payload: bytes, media_type: str, dim: int = 8) -> list[float]:
    """Feature vector from DECODED content: summary statistics of the
    sample/pixel array, padded to `dim` (mean, std, min, max, plus
    per-axis means). Falls back to `fake_features` when no decoder is
    available for the media type, so mixed-modality tables still get a
    full feature column."""
    import numpy as np

    try:
        arr = decode_media(payload, media_type).astype("float64")
    except NotImplementedError:
        return fake_features(payload, dim)
    flat = arr.ravel()
    if flat.size == 0:
        # a legal 0-frame WAV / 0-pixel image decodes to an empty
        # array; its statistics are defined as zeros rather than
        # letting min()/max() raise and kill the whole task
        return [0.0] * dim
    stats = [
        float(flat.mean()),
        float(flat.std()),
        float(flat.min()),
        float(flat.max()),
    ]
    axis_means = arr.mean(axis=tuple(range(1, arr.ndim))) if arr.ndim > 1 else arr
    stats.extend(float(x) for x in np.asarray(axis_means).ravel()[: dim - 4])
    stats.extend(0.0 for _ in range(dim - len(stats)))
    return stats[:dim]


def fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature vector: sha256 bytes → dim floats
    in [0,1). Stable across runs/platforms — used to test the pipeline
    end-to-end without a media decoder."""
    digest = hashlib.sha256(payload).digest()
    return [digest[i] / 255.0 for i in range(dim)]


def media_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata pass over binary payloads via mapInPandas:
    (doc_id, media_type, byte_len, sha256_16)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "sha256_16": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()[:16]
                    ),
                }
            )

    return parallelize_narrow(media).mapInPandas(batches, schema=MEDIA_META_DDL)


def _features_pass(media: DataFrame, dim: int, feature_fn) -> DataFrame:
    """Shared Arrow-batched metadata+features pass; `feature_fn(payload
    bytes, media_type, dim) -> list[float]` is the only moving part —
    the decode seam's "one-line swap" made literal."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "sha256_16": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()[:16]
                    ),
                    "feature": [
                        feature_fn(bytes(b), mt, dim)
                        for b, mt in zip(payloads, pdf["media_type"])
                    ],
                }
            )

    return parallelize_narrow(media).mapInPandas(batches, schema=MEDIA_FEATURE_DDL)


def media_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Metadata + deterministic fake feature vector per payload; the
    real decoder swaps in via the same pass (decoded_media_features)."""
    return _features_pass(media, dim, lambda b, _mt, d: fake_features(b, d))


def decoded_media_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """media_features with the REAL decode seam engaged: payloads whose
    media_type has an available decoder (PGM/PPM/WAV here; PNG/JPEG
    when PIL is installed) get content-derived statistics features via
    `real_features`; everything else degrades to the deterministic
    fake. Same schema and batch shape as media_features — the swap is
    literally the feature_fn argument of the shared pass."""
    return _features_pass(media, dim, real_features)


RESIZED_DDL = "doc_id BIGINT, media_type STRING, orig_len BIGINT, thumb BINARY"


def resize_media(media: DataFrame, thumb_bytes: int = 64) -> DataFrame:
    """Resize/thumbnail pass (stub decode): payload → fixed-size
    representation. The deterministic stand-in truncates-or-pads the
    raw bytes to ``thumb_bytes``; a real implementation decodes,
    resizes, and re-encodes inside the same Arrow batch loop
    (decode_media seam). Output size is constant per row — the property
    downstream training loaders rely on."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"].map(bytes)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "orig_len": payloads.map(len).astype("int64"),
                    "thumb": payloads.map(
                        lambda b: b[:thumb_bytes].ljust(thumb_bytes, b"\x00")
                    ),
                }
            )

    return parallelize_narrow(media).mapInPandas(batches, schema=RESIZED_DDL)


def sample_frames(
    media: DataFrame,
    frame_bytes: int = 256,
    stride: int = 4,
) -> DataFrame:
    """Row-expanding frame sampler: one binary payload → every
    ``stride``-th fixed-size frame, with its index and byte offset.

    This is the video-pipeline shape (container → sampled frames → per-
    frame features): the output row count is payload-dependent, so the
    pass must be `mapInPandas` (1→N rows inside one Arrow batch), not a
    scalar UDF. The "demux" here is a deterministic stub — fixed-size
    byte chunks stand in for container frames; a real demuxer (PyAV)
    plugs into the same loop. At scale, follow with repartition on
    (doc_id % shards) before per-frame decode so one long video doesn't
    pin a task.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "frame_offset": [],
                "frame": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = max((len(raw) + frame_bytes - 1) // frame_bytes, 1)
                for idx in range(0, n_frames, stride):
                    off = idx * frame_bytes
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_offset"].append(off)
                    out["frame"].append(raw[off : off + frame_bytes])
            yield pd.DataFrame(out)

    return parallelize_narrow(media).mapInPandas(batches, schema=FRAME_DDL)


def ahash_bits(payload: bytes, media_type: str, n_bits: int = 16) -> int:
    """Average-hash of DECODED content: split the flattened sample/pixel
    array into `n_bits` contiguous chunks, mean each, set bit i iff
    chunk i's mean exceeds the average of the chunk means — the
    classic aHash, generalized to any modality the decode seam
    handles. A one-pixel/-sample perturbation moves one chunk mean
    marginally (hamming ≈ 0); structural changes (inversion, reorder)
    flip many bits. Payloads that cannot produce a meaningful content
    hash — no decoder, CORRUPT bytes (a decoder raising on truncated
    input must not kill the whole pass), or fewer samples than bits
    (empty chunks would NaN-collide every small payload to hash 0) —
    fall back to md5 bits: exact-content matching, conservative but
    correct."""
    import numpy as np

    def md5_fallback():
        digest = hashlib.md5(payload).digest()
        return int.from_bytes(digest, "big") & ((1 << n_bits) - 1)

    try:
        arr = decode_media(payload, media_type).astype("float64")
    except Exception:
        return md5_fallback()
    flat = arr.ravel()
    if flat.size < n_bits:
        return md5_fallback()
    means = np.array([c.mean() for c in np.array_split(flat, n_bits)])
    bits = means > means.mean()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


def media_phash(media: DataFrame, n_bits: int = 16) -> DataFrame:
    """Per-payload perceptual hash (ahash_bits) with metadata — the
    multimodal analogue of the text SimHash signature. One
    Arrow-batched pass; returns (doc_id, media_type, byte_len, phash).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "phash": [
                        ahash_bits(bytes(b), mt, n_bits)
                        for b, mt in zip(payloads, pdf["media_type"])
                    ],
                }
            )

    return parallelize_narrow(media).mapInPandas(
        batches, schema="doc_id BIGINT, media_type STRING, byte_len BIGINT, phash BIGINT"
    )


def media_phash_near_dup(
    media: DataFrame,
    n_bits: int = 16,
    radius: int = 2,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Multimodal near-dup pairs by perceptual hash: (id_a, id_b,
    hamming) for payloads within `radius` bits.

    Same block-decomposition trick as SimHash text dedup (pigeonhole:
    two hashes within `radius` bits agree exactly on ≥1 of radius+1
    bit blocks), and the same one-shuffle bucketed pair expansion
    (`dedup._bucket_pairs`) with a hot-bucket cap — so the multimodal
    path inherits the text path's 100 TB posture instead of inventing
    a second pair pipeline.
    """
    from .dedup import _bucket_pairs

    n_blocks = radius + 1
    if n_bits < n_blocks:
        raise ValueError(
            f"n_bits={n_bits} < radius+1={n_blocks}: every block needs ≥1 bit "
            "or the pigeonhole recall guarantee breaks"
        )
    # checkpoint the NARROW (doc_id, phash) frame lazily (r9): the
    # bucketed pair core consumes its entries twice (over-cap pre-pass
    # + member collect), and each pass otherwise re-runs the Python
    # decode/hash stage over every payload
    ph = media_phash(media, n_bits).localCheckpoint(eager=False)
    blocks = []
    for b in range(n_blocks):
        # balanced partition (⌊i·n/k⌋ boundaries): every block non-empty,
        # together covering all n_bits — the pigeonhole invariant
        shift = b * n_bits // n_blocks
        width = (b + 1) * n_bits // n_blocks - shift
        mask = (1 << width) - 1
        blocks.append(
            F.struct(
                F.lit(b).alias("block_id"),
                F.shiftrightunsigned("phash", shift).bitwiseAND(F.lit(mask)).alias(
                    "block_val"
                ),
            )
        )
    entries = ph.select(
        F.col("doc_id").alias("id"),
        F.col("phash").alias("ph"),
        F.explode(F.array(*blocks)).alias("e"),
    ).select("id", "ph", "e.block_id", "e.block_val")
    pairs = _bucket_pairs(
        entries, ["block_id", "block_val"], ("id", "ph"), max_bucket_size
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= radius)
    )


def media_byte_entropy(
    media: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-payload BYTE-histogram entropy in milli-nats (round 8) —
    the decoder-free corruption/compression detector every multimodal
    intake runs before spending decode cycles: natural images/audio
    sit mid-entropy, already-compressed or encrypted payloads saturate
    near ln(256)≈5545 milli-nats, and truncated/constant payloads
    collapse toward 0. Pure byte algebra on the opaque column — works
    on ANY media type, which is the point of running it first.

    Engine-exact: bytes come from the hex encoding (two chars per
    byte — the media_resize thumb_hex convention, so DuckDB replays
    without blob indexing), counts are exact integers, and the entropy
    sum follows the X13 ln convention (per-byte -p·ln p on exact
    count ratios, rounded to 6 dp after the 1000 scale).

    Scale shape: explode to (doc, byte) pairs, two map-side-combined
    aggregates — the (doc, byte) count collapses repeats before the
    shuffle, so the wire carries ≤256 rows per document whatever the
    payload size. Returns (doc_id, n_bytes, n_distinct_bytes,
    entropy_milli).
    """
    # ONE regex pass over the hex string — a per-byte substring(pos, 2)
    # re-scans the string from the start each time (O(len²) per doc;
    # measured 9.3 s at sf0.1 vs 1.5 s for this form)
    pairs = F.expr(
        f"regexp_extract_all(lower(hex({payload_col})), '..', 0)"
    )
    base = (
        media.where(F.col(payload_col).isNotNull())
        .where(F.length(F.col(payload_col)) > 0)
        .select(F.col(id_col).alias("id"), F.explode(pairs).alias("b"))
    )
    counts = base.groupBy("id", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ent = (
        -(F.col("c").cast("double") / F.col("n").cast("double"))
        * F.log(F.col("c").cast("double") / F.col("n").cast("double"))
    )
    wn = Window.partitionBy("id")
    return (
        counts.withColumn("n", F.sum("c").over(wn))
        .groupBy("id")
        .agg(
            F.max("n").cast("long").alias("n_bytes"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_bytes"),
            F.round(F.sum(ent) * 1000.0, 6).alias("entropy_milli"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_bytes",
            "n_distinct_bytes",
            "entropy_milli",
        )
    )

def media_type_sniff(
    media: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Magic-byte media-type sniff (round 8): classify every opaque
    payload by its leading byte signature — the intake router that
    decides which decoder pool a payload goes to (and catches the
    mislabeled feed whose 'image/png' column fronts JPEG bytes)
    without spending a single decode cycle. Covers the signatures the
    decode seam knows (binary Netpbm P5/P6) plus the common container
    magics; everything else is 'unknown'.

    Engine-exact: the decision is a CASE over hex prefixes of the
    payload (two hex chars per byte, the media_byte_entropy
    convention) — pure string compares, no Python. One narrow
    projection; pipelines with the scan at any scale.

    Returns (doc_id, declared_type, sniffed_type, match) where match
    is an integer flag (1 when the declared media_type's family
    agrees with the sniffed family, 0 otherwise; declared types this
    package never emits compare as 'unknown').
    """
    hx = F.lower(F.hex(F.col(payload_col)))
    pre = F.substring(hx, 1, 16)
    sniffed = (
        F.when(pre.startswith("50350a") | pre.startswith("503520"), F.lit("image/x-portable-graymap"))
        .when(pre.startswith("50360a") | pre.startswith("503620"), F.lit("image/x-portable-pixmap"))
        .when(pre.startswith("89504e47"), F.lit("image/png"))
        .when(pre.startswith("ffd8ff"), F.lit("image/jpeg"))
        .when(pre.startswith("47494638"), F.lit("image/gif"))
        .when(pre.startswith("52494646"), F.lit("audio/riff"))
        .when(pre.startswith("1f8b"), F.lit("application/gzip"))
        .when(pre.startswith("504b0304"), F.lit("application/zip"))
        .otherwise(F.lit("unknown"))
    )
    declared = F.coalesce(F.col("media_type"), F.lit("unknown"))
    fam = lambda c: F.split(c, "/")[0]  # noqa: E731
    return (
        media.where(F.col(payload_col).isNotNull())
        .select(
            F.col(id_col),
            declared.alias("declared_type"),
            sniffed.alias("sniffed_type"),
            F.when(
                (sniffed != F.lit("unknown"))
                & (fam(sniffed) == fam(declared)),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("match"),
        )
    )
