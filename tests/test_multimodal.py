"""Multimodal plumbing: frame sampling and resize passes through the
Arrow seam — geometry, determinism, and 1→N row expansion."""

from __future__ import annotations

from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators import (
    multimodal,
)
from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.sources.parquet_source import (
    load_table,
)

from .conftest import SF_DIR


def _media(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return multimodal.attach_binary_payload(docs)


def test_sample_frames_geometry(spark):
    frames = multimodal.sample_frames(_media(spark), frame_bytes=256, stride=4)
    rows = frames.collect()
    assert rows, "no frames produced"
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, fs in by_doc.items():
        idxs = sorted(f["frame_idx"] for f in fs)
        assert idxs[0] == 0
        assert all(i % 4 == 0 for i in idxs)
        for f in fs:
            assert f["frame_offset"] == f["frame_idx"] * 256
            assert len(f["frame"]) <= 256


def test_sample_frames_reassembles_payload_prefix(spark):
    # stride=1: concatenating all frames reproduces the original bytes
    media = _media(spark).limit(20)
    orig = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    frames = multimodal.sample_frames(media, frame_bytes=256, stride=1).collect()
    by_doc: dict[int, dict[int, bytes]] = {}
    for f in frames:
        by_doc.setdefault(f["doc_id"], {})[f["frame_idx"]] = bytes(f["frame"])
    for doc_id, parts in by_doc.items():
        joined = b"".join(parts[i] for i in sorted(parts))
        assert joined == orig[doc_id], doc_id


def test_resize_media_fixed_size_and_deterministic(spark):
    media = _media(spark).limit(50)
    a = {r["doc_id"]: bytes(r["thumb"]) for r in multimodal.resize_media(media).collect()}
    b = {r["doc_id"]: bytes(r["thumb"]) for r in multimodal.resize_media(media).collect()}
    assert a == b
    orig = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    for doc_id, thumb in a.items():
        assert len(thumb) == 64
        raw = orig[doc_id]
        assert thumb == raw[:64].ljust(64, b"\x00")


# ------------------------------------------------------------------
# real decode seam: generated PGM/PPM/WAV bytes through decode_media
# ------------------------------------------------------------------


def _pgm_bytes(w=4, h=3):
    import numpy as np

    arr = np.arange(w * h, dtype=np.uint8).reshape(h, w) * 10
    header = f"P5\n# fixture\n{w} {h}\n255\n".encode()
    return header + arr.tobytes(), arr


def _ppm_bytes(w=2, h=2):
    import numpy as np

    arr = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3) * 20
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes(), arr


def _wav_bytes(n=32):
    import io
    import wave

    import numpy as np

    samples = (np.sin(np.arange(n) / 3.0) * 1000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes(samples.tobytes())
    return buf.getvalue(), samples.reshape(n, 1)


def test_decode_media_executes_on_real_bytes():
    """The decode seam runs for real — generated Netpbm and WAV
    payloads decode to the exact arrays they encode."""
    import numpy as np

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.multimodal import (
        decode_media,
    )

    pgm, arr = _pgm_bytes()
    np.testing.assert_array_equal(
        decode_media(pgm, "image/x-portable-graymap"), arr
    )
    ppm, arr3 = _ppm_bytes()
    np.testing.assert_array_equal(
        decode_media(ppm, "image/x-portable-pixmap"), arr3
    )
    wav, samples = _wav_bytes()
    np.testing.assert_array_equal(decode_media(wav, "audio/x-wav"), samples)
    # no decoder for this type -> the seam still raises, callers degrade
    import pytest

    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x01", "video/mp4")


def test_decoded_media_features_content_derived(spark):
    """decoded_media_features computes statistics from the DECODED
    content for decodable types and falls back to the deterministic
    fake for the rest — one pass, mixed modalities."""
    import numpy as np

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.multimodal import (
        decoded_media_features,
        fake_features,
    )

    pgm, arr = _pgm_bytes()
    wav, samples = _wav_bytes()
    opaque = b"binary blob with no decoder"
    media = spark.createDataFrame(
        [
            (1, "image/x-portable-graymap", bytearray(pgm)),
            (2, "audio/x-wav", bytearray(wav)),
            (3, "video/mp4", bytearray(opaque)),
        ],
        "doc_id long, media_type string, payload binary",
    )
    rows = {r["doc_id"]: r for r in decoded_media_features(media).collect()}
    # image features are the pixel statistics, not a hash artifact
    assert rows[1]["feature"][0] == float(arr.astype("float64").mean())
    assert rows[1]["feature"][3] == float(arr.max())
    # audio features come from the decoded samples
    assert rows[2]["feature"][0] == float(samples.astype("float64").mean())
    assert rows[2]["feature"][2] == float(samples.min())
    # undecodable type degrades to the deterministic fake
    assert rows[3]["feature"] == fake_features(opaque, 8)
    # metadata columns stay identical to the fake-feature pass
    assert rows[1]["byte_len"] == len(pgm)


def test_real_features_empty_decode_degrades_to_zeros():
    """A legal 0-frame WAV decodes to an empty array; its statistics
    are zeros, not an uncaught reduction error killing the task."""
    import io
    import wave

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.multimodal import (
        real_features,
    )

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes(b"")
    assert real_features(buf.getvalue(), "audio/x-wav", 8) == [0.0] * 8


def test_media_phash_near_dup_on_real_pixels(spark):
    """Perceptual-hash dedup over REAL decoded PGM images: an exact
    duplicate is hamming-0, a one-pixel perturbation stays within the
    radius, a structurally different image does not pair."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.multimodal import (
        media_phash,
        media_phash_near_dup,
    )

    w, h = 8, 8
    base = bytes((x * 7 + y * 13) % 256 for y in range(h) for x in range(w))
    perturbed = bytearray(base)
    perturbed[17] = (perturbed[17] + 3) % 256  # one pixel, tiny delta
    different = bytes((255 - b) % 256 for b in base)  # inverted image

    def pgm(pixels):
        return b"P5\n%d %d\n255\n" % (w, h) + bytes(pixels)

    rows = [
        (0, "image/x-portable-graymap", pgm(base)),
        (1, "image/x-portable-graymap", pgm(base)),       # exact dup
        (2, "image/x-portable-graymap", pgm(perturbed)),  # near dup
        (3, "image/x-portable-graymap", pgm(different)),  # distinct
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in media_phash_near_dup(media, n_bits=16, radius=2).collect()
    }
    assert pairs.get((0, 1)) == 0
    assert (0, 2) in pairs and pairs[(0, 2)] <= 2
    assert not any(3 in p for p in pairs)

    # phash determinism: identical payloads share the signature
    ph = {r["doc_id"]: r["phash"] for r in media_phash(media, n_bits=16).collect()}
    assert ph[0] == ph[1]
    assert ph[0] != ph[3]


def test_media_phash_registry_query_runs(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.plans.queries import (
        q_media_phash_dedup,
    )
    from .conftest import SF_DIR

    out = q_media_phash_dedup(spark, SF_DIR)
    assert out.columns == ["id_a", "id_b", "hamming"]
    assert out.count() >= 0


def test_ahash_degrades_on_corrupt_and_tiny_payloads(spark):
    """Corrupt bytes of a decodable type and media smaller than n_bits
    must fall back to md5 (exact-content) hashing, not crash or
    NaN-collide to 0."""
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.multimodal import (
        ahash_bits,
    )

    corrupt = b"P5\n4 4\n255\nxx"  # truncated pixel data
    h = ahash_bits(corrupt, "image/x-portable-graymap", 16)
    assert h == ahash_bits(corrupt, "image/x-portable-graymap", 16)

    tiny_a = b"P5\n2 2\n255\n" + bytes([10, 200, 30, 250])
    tiny_b = b"P5\n2 2\n255\n" + bytes([250, 1, 99, 7])
    ha = ahash_bits(tiny_a, "image/x-portable-graymap", 16)
    hb = ahash_bits(tiny_b, "image/x-portable-graymap", 16)
    assert ha != hb  # distinct tiny images must not collide at 0


def test_phash_near_dup_rejects_degenerate_params(spark):
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.operators.multimodal import (
        media_phash_near_dup,
    )
    import pytest as _pytest

    media = spark.createDataFrame(
        [(0, "text/plain", b"x")], "doc_id long, media_type string, payload binary"
    )
    with _pytest.raises(ValueError):
        media_phash_near_dup(media, n_bits=3, radius=3)
