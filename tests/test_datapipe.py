"""Data-pipeline operator specs: dedup family, similarity search, text
analysis, multimodal plumbing — the beyond-reference operators.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from enrich_spark.datapipe import dedup, similarity, text


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),       # exact dup of 1
    (3, "the quick brown fox jumped over the lazy dog"),      # near dup
    (4, "completely different content about spark engines"),
    (5, ""),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id INT, text STRING")


def test_exact_dedup(spark):
    out = dedup.exact_dedup(_docs(spark)).collect()
    groups = {r.content_hash: (r.doc_id, r.dup_count) for r in out}
    assert len(groups) == 4
    assert (1, 2) in groups.values()  # docs 1+2 collapse, min id kept


def test_minhash_identical_docs_equal_signatures(spark):
    sig = dedup.minhash_signature(dedup.shingles(F.col("text"), 2), 8)
    rows = _docs(spark).select("doc_id", sig.alias("sig")).collect()
    by_id = {r.doc_id: r.sig for r in rows}
    assert by_id[1] == by_id[2]
    assert by_id[1] != by_id[4]


def test_minhash_lsh_pairs_finds_dups(spark):
    pairs = dedup.minhash_lsh_pairs(
        _docs(spark), num_hashes=16, bands=8, shingle_k=2, jaccard_threshold=0.5
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in found
    exact = [r for r in pairs if (r.id_a, r.id_b) == (1, 2)][0]
    assert exact.jaccard == 1.0
    assert not any(4 in p for p in found)


def test_simhash_semantics(spark):
    sh = _docs(spark).select("doc_id", dedup.simhash64(F.col("text")).alias("s")).collect()
    by_id = {r.doc_id: r.s for r in sh}
    assert by_id[1] == by_id[2]
    ham_near = bin((by_id[1] ^ by_id[3]) & (2**64 - 1)).count("1")
    ham_far = bin((by_id[1] ^ by_id[4]) & (2**64 - 1)).count("1")
    assert ham_near < ham_far


def test_simhash_pairs(spark):
    pairs = dedup.simhash_pairs(_docs(spark), max_hamming=10).collect()
    assert (1, 2) in {(r.id_a, r.id_b) for r in pairs}
    h = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert h[(1, 2)] == 0


def test_ngram_jaccard_pairs(spark):
    pairs = dedup.ngram_jaccard_pairs(_docs(spark), shingle_k=3, threshold=0.3).collect()
    found = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert (1, 2) in found and found[(1, 2)] == 1.0
    assert (1, 3) in found and 0.3 <= found[(1, 3)] < 1.0


VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.99, 0.01, 0.0, 0.0]),
    (2, [0.0, 1.0, 0.0, 0.0]),
    (3, [0.0, 0.0, 1.0, 0.0]),
    (4, [-1.0, 0.0, 0.0, 0.0]),
]


def _vecs(spark):
    return spark.createDataFrame(VECS, "vec_id INT, embedding ARRAY<DOUBLE>")


def test_brute_force_topk(spark):
    v = _vecs(spark)
    q = v.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = similarity.brute_force_topk(v, q, k=3).orderBy("rank").collect()
    assert [r.vec_id for r in out] == [0, 1, 2]  # self first, near second
    assert math.isclose(out[0].cosine_sim, 1.0)
    assert out[1].cosine_sim > 0.99


def test_lsh_topk_recalls_near_neighbor(spark):
    v = _vecs(spark)
    q = v.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = similarity.lsh_topk(v, q, dim=4, k=3, num_tables=8, bits=2).collect()
    ids = [r.vec_id for r in out]
    assert 0 in ids and 1 in ids  # identical + near vector share a bucket
    assert 4 not in ids or all(r.cosine_sim < 0 for r in out if r.vec_id == 4)


def test_ivf_topk_full_probe_equals_brute_force(spark):
    # nprobe == n_centroids probes every inverted list, so IVF must
    # reproduce exact brute-force top-k (same rounding, same tie-break)
    v = _vecs(spark)
    q = v.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    ivf = similarity.ivf_topk(v, q, k=3, n_centroids=3, nprobe=3).collect()
    exact = {
        (r.query_id, r.rank): r.vec_id
        for r in similarity.brute_force_topk(v, q, k=3).collect()
    }
    assert len(ivf) == 6  # 2 queries × k=3
    assert {(r.query_id, r.rank): r.vec_id for r in ivf} == exact


def test_ivf_topk_prunes_to_probed_lists(spark):
    # nprobe=1 with centroids {0:+x, 2:+y}: the -x vector (id 4) sits in
    # list 2 (orthogonal beats antipodal), so a +x query never rescores it
    v = _vecs(spark)
    q = v.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cents = [(0, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])]
    out = similarity.ivf_topk(v, q, k=5, nprobe=1, centroids=cents).collect()
    ids = {r.vec_id for r in out}
    assert 0 in ids and 1 in ids and 4 not in ids


def test_embedding_dup_pairs(spark):
    out = similarity.embedding_dup_pairs(
        _vecs(spark), dim=4, threshold=0.9, num_tables=8, bits=2
    ).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(0, 1)}


def test_language_id(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog is with that other cat"),
            (2, "der Hund und die Katze ist nicht hier"),
            (3, "le chat est dans la maison avec une souris"),
            (4, "xyzzy 12345"),
        ],
        "doc_id INT, text STRING",
    )
    got = {r.doc_id: r.detected_lang for r in text.language_id(docs).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_quality_score_features(spark):
    docs = spark.createDataFrame(
        [(1, "The quick brown fox jumps over the lazy dog near the river bank.")],
        "doc_id INT, text STRING",
    )
    r = text.quality_score(docs).collect()[0]
    assert r.n_words == 13
    assert r.n_chars == 64
    assert 0 < r.stopword_ratio < 1
    assert r.dup_line_ratio == 0.0
    assert r.top_bigram_char_ratio == 0.0  # no repeated bigram
    assert r.quality_score >= 0.8


def test_quality_repetition_signals(spark):
    """Gopher repetition gates: duplicate-line fraction and top-bigram
    character fraction (Rae et al. 2021 §A1.1)."""
    spam = "buy now " * 20                      # one bigram dominates
    liney = "unique header\n" + "same line\n" * 4 + "footer text here"
    docs = spark.createDataFrame(
        [(1, spam), (2, liney),
         (3, "a perfectly ordinary sentence with the usual words in it")],
        "doc_id INT, text STRING",
    )
    got = {r.doc_id: r for r in text.quality_score(docs).collect()}
    # "buy now" repeats ~20×; well past the 0.18 char-fraction gate
    assert got[1].top_bigram_char_ratio > 0.5
    assert got[1].quality_score < 1.0
    # 4 of 6 non-empty lines are duplicates of one line → 3/6 extra
    assert abs(got[2].dup_line_ratio - 3 / 6) < 1e-9
    assert got[3].dup_line_ratio == 0.0 and got[3].top_bigram_char_ratio == 0.0
    assert got[3].quality_score == 1.0


def test_token_counts(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "a b  c")],
        "doc_id INT, text STRING",
    )
    got = {r.doc_id: (r.ws_tokens, r.bpe_est_tokens) for r in text.token_counts(docs).collect()}
    assert got[1][0] == 2
    assert got[2][0] == 0
    assert got[3][0] == 3
    assert got[1][1] >= 2  # BPE estimate ≥ word count for ascii words


def test_doc_fingerprint_stable(spark):
    docs = spark.createDataFrame(
        [(1, "Some   Document\nText"), (2, "some document text"), (3, "other")],
        "doc_id INT, text STRING",
    )
    rows = {r.doc_id: r for r in text.doc_fingerprint(docs).collect()}
    # whitespace/case-normalized docs share a content hash
    assert rows[1].content_hash == rows[2].content_hash
    assert rows[1].winnow_hash == rows[2].winnow_hash
    assert rows[1].content_hash != rows[3].content_hash


def test_multimodal_plumbing(spark):
    from enrich_spark.datapipe import multimodal

    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG\r\n\x1a\nfakedata")), (2, bytearray(b"RIFF1234WAVEfmt ")), (3, None)],
        "id INT, media BINARY",
    )
    meta = multimodal.attach_media_meta(df).collect()
    by_id = {r.id: r.media_meta for r in meta}
    assert (by_id[1].media_type, by_id[1].format) == ("image", "png")
    assert (by_id[2].media_type, by_id[2].format) == ("audio", "wav")
    assert by_id[3].media_type == "unknown"
    assert by_id[1].n_bytes == 16

    feats = {r.id: r for r in multimodal.decode_features(df).collect()}
    # deterministic stub decode: same bytes → same features, 16-dim
    assert len(feats[1].features) == 16
    assert feats[1].width >= 1 and feats[1].height >= 1
    again = {r.id: r for r in multimodal.decode_features(df).collect()}
    assert feats[1].features == again[1].features

    # passthrough columns ride the Arrow batch (single pass, no self-join)
    with_pt = multimodal.decode_features(
        multimodal.attach_media_meta(df), passthrough=("media_meta",)
    )
    pt = {r.id: r for r in with_pt.collect()}
    assert pt[1].media_meta.format == "png"
    assert pt[1].width == feats[1].width

    # frame-sample planning explodes one row per planned timestamp
    with_meta = multimodal.attach_media_meta(df)
    forced = with_meta.withColumn(
        "media_meta",
        F.col("media_meta").withField("duration_ms", F.lit(3500)),
    )
    frames = multimodal.frame_sample_plan(forced, every_ms=1000)
    assert frames.where(F.col("id") == 1).count() == 4  # t=0,1000,2000,3000


def test_media_codecs_roundtrip():
    import numpy as np

    from enrich_spark.datapipe import media_codecs as mc

    # PNG round-trip (RGB, gradient so filters/mean are non-trivial)
    px = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(4, 15)
    w, h, ch, back = mc.decode_png(mc.encode_png(5, 4, px))
    assert (w, h, ch) == (5, 4, 3)
    assert np.array_equal(back, px)

    # PNG filters 1 (Sub) and 2 (Up) reconstruct correctly
    import struct
    import zlib
    raw = bytes([1]) + bytes([10] + [1] * 5) + bytes([2]) + bytes([0] * 6)
    sig = mc.PNG_SIG

    def chunk(typ, payload):
        return (struct.pack(">I", len(payload)) + typ + payload
                + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    blob = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    w, h, ch, out = mc.decode_png(blob)
    # row0 Sub (per-channel left ref): [10,1,1, 10+1,1+1,1+1]
    assert out[0].tolist() == [10, 1, 1, 11, 2, 2]
    assert out[1].tolist() == out[0].tolist()

    # BMP round-trip (incl. bottom-up flip + row padding)
    px = np.arange(3 * 2 * 3, dtype=np.uint8).reshape(2, 9)
    w, h, ch, back = mc.decode_bmp(mc.encode_bmp(3, 2, px))
    assert (w, h, ch) == (3, 2, 3)
    assert np.array_equal(back, px)

    # WAV round-trip
    samples = np.full(160, 42, np.uint8)
    ch, rate, n, dur, back = mc.decode_wav(mc.encode_wav(8000, samples))
    assert (ch, rate, n, dur) == (1, 8000, 160, 20)
    assert np.array_equal(back, samples)


def test_jpeg_huff_table_memo():
    # r14 opt: decoder Huffman tables are memoized per DHT definition
    # (profiled: rebuilding the 65536-entry peek table per image was
    # 2.0 s of a 4.4 s decode pass). Identity on hit, isolation across
    # distinct definitions, decode equality across hit/miss, bounded
    # eviction.
    import numpy as np

    from enrich_spark.datapipe import jpeg as J

    J._DEC_TABLE_CACHE.clear()
    a1 = J._huff_table([0, 0, 0, 12] + [0] * 12, list(range(12)))
    a2 = J._huff_table([0, 0, 0, 12] + [0] * 12, list(range(12)))
    assert a1 is a2  # memo hit
    b = J._huff_table([0, 0, 0, 0, 16] + [0] * 11, list(range(16)))
    assert b is not a1  # distinct definition, distinct table
    assert b.counts != a1.counts

    # decode twice (miss then hit) → bit-identical pixels
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
    data = J.encode_jpeg(40, 24, img, quality=90)
    J._DEC_TABLE_CACHE.clear()
    first = J.decode_jpeg(data)
    second = J.decode_jpeg(data)
    assert first[:3] == second[:3]
    assert np.array_equal(first[3], second[3])

    # eviction: past 64 distinct definitions the memo resets, stays small
    J._DEC_TABLE_CACHE.clear()
    for n in range(70):
        counts = [0] * 16
        counts[7] = n + 1  # n+1 8-bit codes → 70 distinct definitions
        J._huff_table(counts, list(range(n + 1)))
    assert len(J._DEC_TABLE_CACHE) <= 64
    # and decode still works after eviction churn
    third = J.decode_jpeg(data)
    assert np.array_equal(first[3], third[3])


def test_jpeg_codec():
    import time

    import numpy as np
    import pytest

    from enrich_spark.datapipe.jpeg import (
        DCT_M, UNZIGZAG, ZIGZAG, decode_jpeg, encode_jpeg,
    )

    # generated zigzag matches the published order's known prefix, and
    # the DCT basis is orthonormal (independent identities, not a
    # roundtrip that could cancel a transposed table)
    assert list(ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert (ZIGZAG[UNZIGZAG] == np.arange(64)).all()
    assert np.allclose(DCT_M @ DCT_M.T, np.eye(8), atol=1e-12)

    # solid gray: integer YCbCr + DC-only → bit-exact through
    # quantization (what the multimodal oracle fixture relies on)
    img = np.full((24, 40, 3), 55, dtype=np.uint8)
    w, h, ch, out = decode_jpeg(encode_jpeg(40, 24, img, quality=90))
    assert (w, h, ch) == (40, 24, 3)
    assert np.array_equal(out, img)
    # solid color: fractional chroma → within ±2
    img = np.full((24, 40, 3), (200, 30, 90), dtype=np.uint8)
    _, _, _, out = decode_jpeg(encode_jpeg(40, 24, img, quality=90))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2

    # gradient roundtrip at odd (non-MCU-aligned) dims, all sampling
    # modes + restart markers; PSNR bound, not exactness (JPEG is lossy)
    yy, xx = np.mgrid[0:37, 0:53]
    img = np.stack([(xx * 4) % 256, (yy * 6) % 256, ((xx + yy) * 3) % 256],
                   axis=-1).astype(np.uint8)
    for kwargs in ({"subsample": "444"}, {"subsample": "420"},
                   {"subsample": "444", "restart_interval": 2}):
        w, h, ch, out = decode_jpeg(encode_jpeg(53, 37, img, quality=92, **kwargs))
        assert (w, h, ch) == (53, 37, 3)
        mse = np.mean((out.astype(float) - img.astype(float)) ** 2)
        psnr = 10 * np.log10(255**2 / mse)
        assert psnr > 25, (kwargs, psnr)

    # grayscale (single-component non-interleaved scan path)
    g = ((xx * 5 + yy * 2) % 256).astype(np.uint8)
    w, h, ch, out = decode_jpeg(encode_jpeg(53, 37, g, quality=90))
    assert (w, h, ch) == (53, 37, 1)
    assert 10 * np.log10(
        255**2 / np.mean((out[:, :, 0].astype(float) - g) ** 2)) > 28

    # hostile bytes never escape ValueError/NotImplementedError
    rng = np.random.default_rng(3)
    good = encode_jpeg(16, 16, rng.integers(0, 256, (16, 16, 3)).astype(np.uint8))
    for bad in (b"", b"\xff\xd8", good[:40], good[:len(good) // 2],
                bytes(rng.integers(0, 256, 200, dtype=np.uint8))):
        with pytest.raises((ValueError, NotImplementedError, IndexError,
                            KeyError, StopIteration)):
            decode_jpeg(bad)

    # progressive: full feature set (interleaved DC first/refine,
    # spectral-band AC first, AC refine with correction bits) must be
    # PIXEL-IDENTICAL to baseline — both carry the same coefficients
    for kwargs in ({"subsample": "444"}, {"subsample": "420"}):
        base_px = decode_jpeg(encode_jpeg(53, 37, img, quality=92, **kwargs))[3]
        prog_px = decode_jpeg(encode_jpeg(53, 37, img, quality=92,
                                          progressive=True, **kwargs))[3]
        assert np.array_equal(base_px, prog_px), kwargs
    gb = decode_jpeg(encode_jpeg(53, 37, g, quality=90))[3]
    gp = decode_jpeg(encode_jpeg(53, 37, g, quality=90, progressive=True))[3]
    assert np.array_equal(gb, gp)
    # a baseline stream RELABELED as SOF2 is malformed (DC scan with
    # Se=63) and must fail loudly, not decode garbage
    with pytest.raises(ValueError):
        decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc2", 1))

    # CMYK / Adobe YCCK: 4-component stream with APP14 transform=2 →
    # RGB via the inverted-channel convention, baseline == progressive
    cm = np.stack([(xx * 8) % 256, (yy * 11) % 256, ((xx + yy) * 5) % 256,
                   np.full_like(xx, 40)], axis=-1).astype(np.uint8)
    ref = np.clip(np.round(
        (255.0 - cm[..., :3]) * (255.0 - cm[..., 3:4]) / 255.0), 0, 255)
    cb_px = decode_jpeg(encode_jpeg(53, 37, cm, quality=95))
    assert cb_px[:3] == (53, 37, 3)
    assert np.abs(cb_px[3].astype(float) - ref).max() <= 16
    cp_px = decode_jpeg(encode_jpeg(53, 37, cm, quality=95,
                                    progressive=True))[3]
    assert np.array_equal(cb_px[3], cp_px)

    # documented throughput bound: a 256×256 photo-like image decodes
    # within the ~1 s/MP envelope the module docstring claims
    big = rng.integers(0, 64, (256, 256, 3), dtype=np.uint8).astype(np.uint8)
    data = encode_jpeg(256, 256, big, quality=60, subsample="420")
    t0 = time.time()
    w, h, ch, out = decode_jpeg(data)
    assert (w, h) == (256, 256)
    assert time.time() - t0 < 2.0


def test_gif_codec():
    import numpy as np
    import pytest

    from enrich_spark.datapipe.media_codecs import decode_gif, encode_gif

    # lossless palette roundtrip through real LZW
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, (37, 53))
    w, h, ch, out = decode_gif(encode_gif(53, 37, pal, idx))
    assert (w, h, ch) == (53, 37, 3)
    assert np.array_equal(out, pal[idx])

    # extension blocks (GIF89a graphics-control) are skipped correctly
    data = bytearray(encode_gif(4, 3, pal[:4], np.zeros((3, 4), int)))
    img_desc = data.index(0x2C, 13)
    gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    data[img_desc:img_desc] = gce
    w, h, ch, out = decode_gif(bytes(data))
    assert (w, h) == (4, 3) and np.all(out == pal[0])

    # interlaced frames reorder through the 4-pass row permutation:
    # store rows in interlace order, set the flag, expect the original
    h10 = 10
    order = np.concatenate([np.arange(0, h10, 8), np.arange(4, h10, 8),
                            np.arange(2, h10, 4), np.arange(1, h10, 2)])
    original = np.tile(np.arange(h10) % 4, (6, 1)).T  # distinct row values
    data = bytearray(encode_gif(6, h10, pal[:4], original[order]))
    desc = data.index(0x2C, 13)
    data[desc + 9] |= 0x40  # interlace flag in the image descriptor
    w, h, ch, out = decode_gif(bytes(data))
    assert np.array_equal(out, pal[original])

    # hostile bytes raise, never hang or return garbage
    good = encode_gif(8, 8, pal[:4], np.zeros((8, 8), int))
    for bad in (b"", b"GIF89a", b"GIF89a" + bytes(30), good[:20], b"NOPE"):
        with pytest.raises((ValueError, IndexError)):
            decode_gif(bad)


def test_attach_media_meta_native_headers(spark):
    """Container metadata parsed natively (no Python stage): PNG/BMP
    dims, canonical-WAV duration, AVI avih width/height/duration;
    non-canonical layouts stay NULL."""
    import numpy as np

    from enrich_spark.datapipe import media_codecs as mc
    from enrich_spark.datapipe.multimodal import attach_media_meta

    rows = [
        (1, bytearray(mc.encode_png(5, 4, np.full((4, 15), 7, np.uint8)))),
        (2, bytearray(mc.encode_bmp(3, 2, np.full((2, 9), 7, np.uint8)))),
        (3, bytearray(mc.encode_wav(8000, np.full(1600, 5, np.uint8)))),
        (4, bytearray(mc.encode_avi(320, 240, 25, 100))),
        (5, bytearray(b"RIFF\x00\x00\x00\x00AVI not-canonical")),
        (6, bytearray(b"garbage")),
    ]
    df = spark.createDataFrame(rows, "id INT, media BINARY")
    out = attach_media_meta(df).select("id", "media_meta.*")
    # the parse is pure Catalyst — no Python eval stage in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    got = {r.id: r for r in out.collect()}
    assert (got[1].format, got[1].width, got[1].height) == ("png", 5, 4)
    assert (got[2].format, got[2].width, got[2].height) == ("bmp", 3, 2)
    assert (got[3].format, got[3].duration_ms) == ("wav", 200)
    assert (got[4].format, got[4].width, got[4].height,
            got[4].duration_ms) == ("avi", 320, 240, 4000)
    assert got[5].width is None and got[5].duration_ms is None
    assert got[6].format == "unknown" and got[6].width is None


def test_attach_media_meta_webp_dims(spark):
    """WebP dims from all three sub-format headers, hand-built to spec
    (VP8X 24-bit minus-one canvas, VP8L bit-packed 14-bit, lossy VP8
    after the 9D 01 2A start code)."""
    import struct

    from enrich_spark.datapipe.multimodal import attach_media_meta

    def riff(payload):
        return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" + payload

    # VP8X: 320×240 canvas → stored minus one
    vp8x = riff(b"VP8X" + struct.pack("<I", 10) + b"\x00\x00\x00\x00"
                + (319).to_bytes(3, "little") + (239).to_bytes(3, "little"))
    # VP8L: 100×50 → (w-1)=99 in bits 0..13, (h-1)=49 in bits 14..27
    packed = 99 | (49 << 14)
    vp8l = riff(b"VP8L" + struct.pack("<I", 5) + b"\x2f"
                + packed.to_bytes(4, "little"))
    # lossy VP8: 64×32 after the frame tag + start code
    vp8 = riff(b"VP8 " + struct.pack("<I", 10) + b"\x00\x00\x00"
               + b"\x9d\x01\x2a" + struct.pack("<HH", 64, 32))
    df = spark.createDataFrame(
        [(1, bytearray(vp8x)), (2, bytearray(vp8l)), (3, bytearray(vp8)),
         (4, bytearray(riff(b"JUNK" + b"\x00" * 12)))],
        "id INT, media BINARY",
    )
    got = {r.id: r for r in attach_media_meta(df).select("id", "media_meta.*").collect()}
    assert all(got[i].format == "webp" for i in (1, 2, 3, 4))
    assert (got[1].width, got[1].height) == (320, 240)
    assert (got[2].width, got[2].height) == (100, 50)
    assert (got[3].width, got[3].height) == (64, 32)
    assert got[4].width is None and got[4].height is None


def test_decode_features_real_kernels(spark):
    import numpy as np

    from enrich_spark.datapipe import media_codecs as mc
    from enrich_spark.datapipe import multimodal

    from enrich_spark.datapipe.jpeg import encode_jpeg

    png = mc.encode_png(4, 3, np.full((3, 12), 7, np.uint8))
    bmp = mc.encode_bmp(2, 2, np.full((2, 6), 9, np.uint8))
    wav = mc.encode_wav(8000, np.full(800, 5, np.uint8))
    jpg = encode_jpeg(10, 6, np.full((6, 10, 3), 55, np.uint8), quality=90)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(bmp)), (3, bytearray(wav)),
         (4, bytearray(b"not media")), (5, bytearray(jpg))],
        "id INT, media BINARY",
    )
    rows = {r.id: r for r in multimodal.decode_features(df).collect()}
    assert (rows[5].width, rows[5].height, rows[5].channels,
            rows[5].codec) == (10, 6, 3, "jpeg")
    assert rows[5].mean_val == 55.0
    assert (rows[1].width, rows[1].height, rows[1].channels, rows[1].codec) == (4, 3, 3, "png")
    assert rows[1].mean_val == 7.0
    assert (rows[2].width, rows[2].height, rows[2].codec) == (2, 2, "bmp")
    assert rows[2].mean_val == 9.0
    assert (rows[3].duration_ms, rows[3].channels, rows[3].codec) == (100, 1, "wav")
    assert rows[3].mean_val == 5.0
    # unknown format falls back to the digest stub, flagged
    assert rows[4].codec == "stub" and rows[4].mean_val is None
    assert len(rows[4].features) == 16


def test_wav_audio_features():
    """Real spectral features from the decode kernel: a pure sine at f
    has ZCR ≈ 2f/rate and spectral centroid ≈ f/nyquist."""
    import numpy as np

    from enrich_spark.datapipe import media_codecs as mc
    from enrich_spark.datapipe.multimodal import _decode_one

    rate, f = 8000, 1000
    t = np.arange(4000) / rate
    sine = (np.sin(2 * np.pi * f * t) * 12000).astype("<i2")
    row = _decode_one(mc.encode_wav(rate, sine))
    assert row["codec"] == "wav"
    mean_n, rms, zcr, centroid = row["features"]
    assert abs(rms - 12000 / 32768 / np.sqrt(2)) < 0.01   # sine RMS = A/√2
    assert abs(zcr - 2 * f / rate) < 0.01                 # 2 crossings/cycle
    assert abs(centroid - f / (rate / 2)) < 0.02          # f over nyquist
    # silence → all-zero features, no NaN
    row = _decode_one(mc.encode_wav(rate, np.zeros(100, "<i2")))
    assert row["features"][1:] == [0.0, 0.0, 0.0]


def test_mp3_metadata():
    import numpy as np
    import pytest

    from enrich_spark.datapipe.media_codecs import encode_mp3, parse_mp3
    from enrich_spark.datapipe.multimodal import _decode_one

    ch, rate, br, n, dur = parse_mp3(encode_mp3(40))
    assert (ch, rate, br, n) == (2, 44100, 128000, 40)
    assert dur == 40 * 1152 * 1000 // 44100
    # ID3v2 prefix skipped (syncsafe size)
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + bytes(10)
    assert parse_mp3(id3 + encode_mp3(5))[3] == 5
    # mono, other rate/bitrate
    assert parse_mp3(encode_mp3(10, bitrate_kbps=64, rate=32000,
                                stereo=False))[:3] == (1, 32000, 64000)
    for bad in (b"", b"\xff\xfb", b"ID3", bytes(50)):
        with pytest.raises((ValueError, IndexError)):
            parse_mp3(bad)
    # kernel routing: metadata-only decode, flagged codec='mp3'
    row = _decode_one(encode_mp3(12))
    assert (row["codec"], row["channels"]) == ("mp3", 2)
    assert row["duration_ms"] == 12 * 1152 * 1000 // 44100
    assert row["mean_val"] is None and row["features"] == []


def test_tiff_metadata():
    import pytest

    from enrich_spark.datapipe.media_codecs import encode_tiff_header, parse_tiff
    from enrich_spark.datapipe.multimodal import _decode_one

    for be in (False, True):
        assert parse_tiff(encode_tiff_header(1024, 768, be)) == (1024, 768)
    with pytest.raises(ValueError):
        parse_tiff(b"NOPE")
    row = _decode_one(encode_tiff_header(640, 480))
    assert (row["codec"], row["width"], row["height"]) == ("tiff", 640, 480)


def test_webm_metadata():
    import pytest

    from enrich_spark.datapipe.media_codecs import encode_webm_header, parse_webm
    from enrich_spark.datapipe.multimodal import _decode_one

    data = encode_webm_header(12345, 640, 360)
    assert parse_webm(data) == (12345, 640, 360)
    with pytest.raises(ValueError):
        parse_webm(b"junk")
    row = _decode_one(data)
    assert (row["codec"], row["duration_ms"],
            row["width"], row["height"]) == ("webm", 12345, 640, 360)
    assert row["mean_val"] is None  # metadata-only, honestly flagged


def test_attach_media_meta_mp3_native_duration(spark):
    from enrich_spark.datapipe.media_codecs import encode_mp3
    from enrich_spark.datapipe.multimodal import attach_media_meta

    data = encode_mp3(40)  # 40 frames × 417 bytes at 128 kbps
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + bytes(10) + encode_mp3(5)
    df = spark.createDataFrame(
        [(1, bytearray(data)), (2, bytearray(id3))], "id INT, media BINARY")
    got = {r.id: r for r in attach_media_meta(df).select("id", "media_meta.*").collect()}
    assert got[1].format == "mp3" and got[1].media_type == "audio"
    assert got[1].duration_ms == 40 * 417 * 8 * 1000 // 128000
    # ID3-prefixed: sniffed as mp3, but native CBR duration stays NULL
    # (variable tag offset) — the decode kernel walks it instead
    assert got[2].format == "mp3" and got[2].duration_ms is None


def test_language_id_ngram_accuracy(spark):
    # held-out sentences (NOT in the seed corpora) — the trigram profile
    # model must classify all of them; plus und for non-language input
    from enrich_spark.datapipe.text import language_id

    cases = [
        ("the weather was cold but the children wanted to play outside", "en"),
        ("it is important that everyone has a chance to learn and grow", "en"),
        ("die kinder wollten draussen spielen obwohl das wetter kalt war", "de"),
        ("es ist wichtig dass jeder die gelegenheit hat zu lernen", "de"),
        ("les enfants voulaient jouer dehors malgre le temps froid", "fr"),
        ("il est important que chacun ait la chance de apprendre", "fr"),
        ("los ninos querian jugar afuera aunque hacia mucho frio", "es"),
        ("es importante que todos tengan la oportunidad de aprender", "es"),
        ("i bambini volevano giocare fuori anche se faceva freddo", "it"),
        ("e importante che tutti abbiano la possibilita di imparare", "it"),
        ("as criancas queriam brincar do lado de fora apesar do frio", "pt"),
        ("e importante que todos tenham a oportunidade de aprender", "pt"),
        ("de kinderen wilden buiten spelen hoewel het koud was", "nl"),
        ("het is belangrijk dat iedereen de kans krijgt om te leren", "nl"),
        ("0101 9988 7766 ++++ ----", "und"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "doc_id INT, text STRING"
    )
    got = {r.doc_id: r.detected_lang for r in language_id(df).collect()}
    wrong = [(cases[i][0], cases[i][1], got[i])
             for i in range(len(cases)) if got[i] != cases[i][1]]
    assert not wrong, f"misclassified: {wrong}"


def test_train_centroids_kmeans(spark):
    # three well-separated direction clusters → trained centroids align
    # with them, and nprobe=1 IVF over the trained centroids retrieves
    # in-cluster neighbors only
    import numpy as np

    rng = np.random.default_rng(3)
    base = {0: [1.0, 0, 0, 0], 1: [0, 1.0, 0, 0], 2: [0, 0, 1.0, 0]}
    rows = []
    for i in range(60):
        c = i % 3
        v = np.array(base[c]) + rng.normal(0, 0.05, 4)
        rows.append((i, [float(x) for x in v]))
    vecs = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")

    cents = similarity.train_centroids(vecs, n_centroids=3, iters=10)
    assert len(cents) == 3
    C = np.array([c for _, c in cents])
    for axis in range(3):
        e = np.zeros(4); e[axis] = 1.0
        assert max(C @ e) > 0.98  # one centroid per cluster direction

    q = vecs.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = similarity.ivf_topk(vecs, q, k=5, nprobe=1, centroids=cents).collect()
    assert len(out) == 5
    assert all(r.vec_id % 3 == 0 for r in out)  # all from query's cluster


def test_ngram_jaccard_prefix_filter_is_exact(spark):
    # prefix filtering must return EXACTLY the brute-force pair set —
    # the completeness guarantee is the whole point of the scale path
    import itertools

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "the quick brown fox jumped over the lazy dog"),
        (4, "a quick brown dog jumps over a lazy fox"),
        (5, "completely different content about spark engines"),
        (6, "spark engines process completely different content"),
        (7, "one"),
        (8, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id INT, text STRING")
    for thr in (0.3, 0.5, 0.8):
        got = {
            (r.id_a, r.id_b): round(r.jaccard, 6)
            for r in dedup.ngram_jaccard_pairs_prefix(
                df, shingle_k=2, threshold=thr
            ).collect()
        }
        # brute force over collected shingle sets
        sh = {
            r.doc_id: set(r.sh)
            for r in df.select(
                "doc_id", dedup.shingles(F.col("text"), 2).alias("sh")
            ).collect()
        }
        want = {}
        for x, y in itertools.combinations(sorted(sh), 2):
            if not sh[x] or not sh[y]:
                continue
            j = len(sh[x] & sh[y]) / len(sh[x] | sh[y])
            if j >= thr:
                want[(x, y)] = round(j, 6)
        assert got == want, f"threshold {thr}"


def test_dup_clusters_connected_components(spark):
    # chain 1-2-3 plus pair (10,11) plus a long path 20..24 exercising
    # multi-iteration propagation; only clustered nodes appear
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (23, 24)],
        "id_a INT, id_b INT",
    )
    out = {r.doc_id: (r.cluster_id, r.is_keeper)
           for r in dedup.dup_clusters(pairs).collect()}
    assert {d: c for d, (c, _) in out.items()} == {
        1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
        20: 20, 21: 20, 22: 20, 23: 20, 24: 20,
    }
    keepers = {d for d, (_, k) in out.items() if k}
    assert keepers == {1, 10, 20}

    # fixed-round mode (no per-round convergence action) matches the
    # converging mode when rounds ≥ diameter
    fixed = {r.doc_id: (r.cluster_id, r.is_keeper)
             for r in dedup.dup_clusters(pairs, fixed_rounds=6).collect()}
    assert fixed == out


def test_duplicate_substring_windows(spark):
    """Exact substring duplication (Lee et al. 2022, word windows):
    cross-doc runs ≥ k words are found, spans merge adjacent windows,
    short/empty/null docs yield zeros."""
    common = "the quick brown fox jumps over the lazy dog every single day"
    docs = spark.createDataFrame([
        (1, f"unique prefix one {common} unique suffix alpha"),
        (2, f"other start text {common} and a different ending here"),
        (3, "completely different content with no repeats at all in it ok"),
        (4, "short"),
        (5, None),
    ], "doc_id INT, text STRING")
    got = {r.doc_id: r for r in
           dedup.duplicate_substring_windows(docs, k=8).collect()}
    # the 12-word shared run starts at word 4 in both docs → windows
    # 4..8 (5 of them), one merged span covering words 4..15
    for d in (1, 2):
        assert got[d].n_dup_windows == 5
        assert [(s.start, s.end) for s in got[d].dup_spans] == [(4, 15)]
    assert got[1].dup_window_frac == round(5 / 11, 4)
    assert got[3].n_dup_windows == 0 and got[3].dup_spans == []
    assert got[4].n_windows == 0 and got[5].n_windows == 0

    # two separated duplicated runs in one doc → two spans
    run2 = "alpha beta gamma delta epsilon zeta eta theta"
    docs2 = spark.createDataFrame([
        (1, f"{common} xx yy zz ww vv uu tt ss {run2}"),
        (2, f"{run2} mm nn oo pp qq rr kk jj {common}"),
    ], "doc_id INT, text STRING")
    got2 = {r.doc_id: r for r in
            dedup.duplicate_substring_windows(docs2, k=8).collect()}
    assert len(got2[1].dup_spans) == 2
    assert len(got2[2].dup_spans) == 2


def test_remove_duplicate_spans(spark):
    """Span application (Lee et al. 2022's actual output): duplicated
    runs are CUT from the text. Covers the boundary edges — staggered
    overlapping windows chaining into one span, spans at the doc head
    and tail, clean/short/null docs."""
    docs = spark.createDataFrame([
        (1, "x1 a1 a2 a3 a4 a5 a6 a7 a8 b1 b2 x2"),
        (2, "a1 a2 a3 a4 a5 a6 a7 a8 yy zz"),
        (3, "a3 a4 a5 a6 a7 a8 b1 b2 qq rr"),
        (4, "clean words only in this document nothing repeated anywhere today"),
        (5, "tiny"),
        (6, None),
    ], "doc_id INT, text STRING")
    sub = {r.doc_id: r for r in
           dedup.duplicate_substring_windows(docs, k=8).collect()}
    # doc 1's dup windows sit at pos 2 (vs doc 2) and pos 4 (vs doc 3):
    # starts differ by 2 < k but their word coverage overlaps, so they
    # chain into ONE span [2, 11] — not two overlapping spans
    assert [(s.start, s.end) for s in sub[1].dup_spans] == [(2, 11)]

    got = {r.doc_id: r for r in
           dedup.remove_duplicate_spans(docs, k=8).collect()}
    assert got[1].cleaned_text == "x1 x2"
    assert got[1].n_words == 12 and got[1].removed_words == 10
    assert got[1].n_spans == 1
    # span at the doc head / tail
    assert got[2].cleaned_text == "yy zz" and got[2].removed_words == 8
    assert got[3].cleaned_text == "qq rr" and got[3].removed_words == 8
    assert got[4].removed_words == 0
    assert got[4].cleaned_text.startswith("clean words")
    assert got[5].cleaned_text == "tiny" and got[5].removed_words == 0
    assert got[6].cleaned_text == "" and got[6].n_spans == 0


def test_contamination_check_multi(spark):
    """Multi-eval-set decontamination: per-set n-gram size and the
    min_overlap_windows threshold; clean (doc, set) pairs are omitted."""
    q1 = "what is the capital of france and when was it founded"
    q2 = "solve for x in the equation two x plus five equals eleven yes"
    docs = spark.createDataFrame([
        (1, f"page with {q1} inside it plus extra padding words"),
        (2, f"prefix {q2} trailing"),
        (3, "clean doc nothing shared with any benchmark here at all today"),
    ], "doc_id INT, text STRING")
    b1 = spark.createDataFrame([(q1,)], "text STRING")
    b2 = spark.createDataFrame([(q2,)], "text STRING")
    rows = dedup.contamination_check_multi(
        docs, [("qa", b1, 8), ("math", b2, 13)],
        min_overlap_windows=2).collect()
    got = {(r.doc_id, r.benchmark): r for r in rows}
    assert set(got) == {(1, "qa"), (2, "math")}
    r1 = got[(1, "qa")]
    # the 11-word question embeds 4 of doc 1's 8-grams → over threshold
    assert r1.k == 8 and r1.contaminated_windows == 4 and r1.contaminated
    r2 = got[(2, "math")]
    # exactly one 13-gram hit → marked but UNDER the threshold
    assert r2.k == 13 and r2.contaminated_windows == 1
    assert not r2.contaminated


def test_contamination_check(spark):
    """Benchmark decontamination: training docs sharing any exact k-word
    window with the benchmark corpus are marked, with fraction and the
    benchmark ids hit; clean/short docs report zeros."""
    bench_q = "what is the capital of france and when was it founded exactly"
    docs = spark.createDataFrame([
        (1, f"some scraped page containing {bench_q} plus other words"),
        (2, "a perfectly clean training document with no overlap at all here"),
        (3, "tiny"),
    ], "doc_id INT, text STRING")
    bench = spark.createDataFrame(
        [(100, bench_q), (200, "unrelated benchmark question about math")],
        "bench_id INT, text STRING",
    )
    got = {r.doc_id: r for r in
           dedup.contamination_check(docs, bench, k=8).collect()}
    assert got[1].contaminated_windows > 0
    assert got[1].hit_benchmarks == [100]
    assert 0 < got[1].contaminated_frac <= 1.0
    assert got[2].contaminated_windows == 0 and got[2].hit_benchmarks == []
    assert got[3].n_windows == 0


def test_contamination_check_bloom_matches_exact(spark):
    """The Bloom scale path must be OUTPUT-identical to the exact
    operator on arbitrary data — false positives exist only between the
    probe and the confirm join."""
    import random

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(60)]
    bench_rows = [(100 + b, " ".join(rng.choice(vocab) for _ in range(20)))
                  for b in range(4)]
    doc_rows = [(i, " ".join(rng.choice(vocab) for _ in range(40)))
                for i in range(30)]
    # plant guaranteed overlaps: splice a benchmark 8-gram into some docs
    planted = bench_rows[0][1].split()[3:11]
    for i in (5, 17):
        doc_rows[i] = (i, doc_rows[i][1] + " " + " ".join(planted))
    docs = spark.createDataFrame(doc_rows, "doc_id INT, text STRING")
    bench = spark.createDataFrame(bench_rows, "bench_id INT, text STRING")
    exact = {r.doc_id: (r.n_windows, r.contaminated_windows,
                        r.contaminated_frac, r.hit_benchmarks)
             for r in dedup.contamination_check(docs, bench, k=8).collect()}
    bloom = {r.doc_id: (r.n_windows, r.contaminated_windows,
                        r.contaminated_frac, r.hit_benchmarks)
             for r in dedup.contamination_check_bloom(
                 docs, bench, k=8, m_bits=1 << 12).collect()}
    assert bloom == exact
    assert bloom[5][1] > 0 and bloom[17][1] > 0


def test_contamination_bloom_m_bits_guard(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id INT, text STRING")
    with pytest.raises(ValueError):
        dedup.contamination_check_bloom(docs, docs.withColumnRenamed(
            "doc_id", "bench_id"), m_bits=100)


def test_language_id_nonlatin_scripts(spark):
    """Unicode-script dominance identifies non-Latin languages natively;
    Kana precedence keeps mixed kanji/kana Japanese out of 'zh'."""
    from enrich_spark.datapipe.text import language_id

    cases = [
        ("Быстрая коричневая лиса прыгает через ленивую собаку", "ru"),
        ("今天天气很好我们去公园散步吧", "zh"),
        ("今日はとてもいい天気ですから公園へ行きましょう", "ja"),   # kanji + kana
        ("오늘 날씨가 좋아서 공원에 갑니다", "ko"),
        ("الطقس جميل اليوم فلنذهب إلى الحديقة", "ar"),
        ("מזג האוויר יפה היום אז נלך לפארק", "he"),
        ("ο καιρός είναι ωραίος σήμερα πάμε στο πάρκο", "el"),
        ("आज मौसम अच्छा है तो चलो पार्क चलते हैं", "hi"),
        ("the weather is nice today so let us walk to the park", "en"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "doc_id INT, text STRING"
    )
    got = {r.doc_id: r.detected_lang for r in language_id(df).collect()}
    wrong = [(cases[i][0], cases[i][1], got[i])
             for i in range(len(cases)) if got[i] != cases[i][1]]
    assert not wrong, f"misclassified: {wrong}"


def test_language_id_null_and_empty_are_und(spark):
    # NULL text used to score -1 as the floor (sizeOfNull), letting every
    # 0-score language "win"; both NULL and empty must stay 'und'
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   ")], "doc_id INT, text STRING"
    )
    got = {r.doc_id: r.detected_lang for r in text.language_id(docs).collect()}
    assert got == {1: "und", 2: "und", 3: "und"}


def test_sessionize_max_events_per_user_cap(spark):
    import datetime as dt

    from enrich_spark.datapipe.session import sessionize

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [("hot", t0 + dt.timedelta(minutes=i), f"e{i:03d}") for i in range(10)]
    rows += [("cold", t0, "c0"), ("cold", t0 + dt.timedelta(hours=2), "c1")]
    df = spark.createDataFrame(rows, "user_id STRING, ts TIMESTAMP, event_id STRING")

    capped = sessionize(df, max_events_per_user=3).collect()
    by_user = {}
    for r in capped:
        by_user.setdefault(r.user_id, []).append(r)
    # hot user truncated to first 3 events by time order
    assert sorted(r.event_id for r in by_user["hot"]) == ["e000", "e001", "e002"]
    # cold user untouched, still splits into two sessions
    assert {r.session_index for r in by_user["cold"]} == {1, 2}
    # uncapped keeps everything
    assert len(sessionize(df).collect()) == 12


def test_dup_clusters_warns_on_iteration_cap(spark):
    import warnings as w

    # path graph 0-1-2-...-6: min-label propagation needs several rounds;
    # max_iter=1 cannot converge and must warn instead of silently splitting
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "id_a INT, id_b INT"
    )
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        dedup.dup_clusters(pairs, max_iter=1).collect()
    assert any("did not converge" in str(c.message) for c in caught)
    # and a sufficient max_iter stays silent
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        out = dedup.dup_clusters(pairs, max_iter=10).collect()
    assert not any("did not converge" in str(c.message) for c in caught)
    assert {r.cluster_id for r in out} == {0}


def test_png_all_filters_roundtrip_and_speed():
    import struct
    import time
    import zlib

    import numpy as np

    from enrich_spark.datapipe import media_codecs as mc

    rng = np.random.default_rng(7)
    w = h = 1000
    px = rng.integers(0, 256, (h, w * 3), dtype=np.uint8)
    timings = {}
    for f in (0, 1, 2, 3, 4):
        data = mc.encode_png(w, h, px, color=2, filter_type=f)
        t0 = time.time()
        got_w, got_h, got_ch, out = mc.decode_png(data)
        timings[f] = time.time() - t0
        assert (got_w, got_h, got_ch) == (w, h, 3)
        assert np.array_equal(out, px), f"filter {f} roundtrip"
    # fully-vectorized filters decode a 1000x1000 RGB in well under 100ms;
    # Average/Paeth go through the wavefront path (~0.2s measured, 40x
    # over the per-pixel loop). The floor is a regression tripwire for
    # an accidental per-pixel fallback (that is ~8 s), so the bound can
    # be generous: best-of-2 under 5x the steady-state numbers rides
    # out CPU contention from parallel suites without masking a real
    # 40x regression.
    for f in (1, 2, 3, 4):
        if timings[f] >= (0.5 if f in (1, 2) else 2.0):
            data = mc.encode_png(w, h, px, color=2, filter_type=f)
            t0 = time.time()
            mc.decode_png(data)
            timings[f] = min(timings[f], time.time() - t0)
    assert timings[1] < 0.5 and timings[2] < 0.5
    assert timings[3] < 2.0 and timings[4] < 2.0

    # adaptive-encoder style: a different filter on every scanline
    ch, size = 3, 64
    small = rng.integers(0, 256, (size, size * ch), dtype=np.uint8)
    rows, prev = [], np.zeros(size * ch, dtype=np.int64)
    for y in range(size):
        cur = small[y].astype(np.int64)
        left = np.zeros_like(cur)
        left[ch:] = cur[:-ch]
        fy = y % 5
        if fy == 0:
            res = cur
        elif fy == 1:
            res = cur - left
        elif fy == 2:
            res = cur - prev
        elif fy == 3:
            res = cur - ((left + prev) >> 1)
        else:
            upleft = np.zeros_like(prev)
            upleft[ch:] = prev[:-ch]
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pr = np.where((pa <= pb) & (pa <= pc), left,
                          np.where(pb <= pc, prev, upleft))
            res = cur - pr
        rows.append(bytes([fy]) + (res & 0xFF).astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ, payload):
        return (struct.pack(">I", len(payload)) + typ + payload
                + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF))

    data = (mc.PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", size, size, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + chunk(b"IEND", b""))
    _, _, _, out = mc.decode_png(data)
    assert np.array_equal(out, small)


# ---------------------------------------------------------------------------
# curation operators (datapipe/curation.py)


def test_scrub_text_pii(spark):
    """Emails / IPv4 / phones redact to tokens with per-doc counts;
    phone scrubbing is opt-out; clean and null docs pass through."""
    from enrich_spark.datapipe import curation

    docs = spark.createDataFrame([
        (1, "mail me at jane.doe+x@example.com or bob@sub.acme.co.uk now"),
        (2, "server 10.0.0.1 talked to 192.168.4.250 yesterday"),
        (3, "call +1 555-123-4567 or (020) 7946 0958 today"),
        (4, "perfectly clean prose with the number 42 and year 2024"),
        (5, None),
        (6, "host 2001:0db8:85a3:0000:0000:8a2e:0370:7334 and fe80::1 up"),
    ], "doc_id INT, text STRING")
    got = {r.doc_id: r for r in curation.scrub_text_pii(docs).collect()}
    assert got[1].n_emails == 2
    assert got[1].scrubbed_text == "mail me at <EMAIL> or <EMAIL> now"
    assert got[2].n_ips == 2
    assert "<IP>" in got[2].scrubbed_text and "10.0.0.1" not in got[2].scrubbed_text
    assert got[3].n_phones == 2
    assert "555" not in got[3].scrubbed_text
    assert got[4].scrubbed_text == docs.collect()[3].text
    assert (got[4].n_emails, got[4].n_ips, got[4].n_phones) == (0, 0, 0)
    assert got[5].scrubbed_text is None and got[5].n_emails == 0
    assert got[6].n_ipv6 == 2
    assert "0db8" not in got[6].scrubbed_text
    assert got[6].scrubbed_text == "host <IP> and <IP> up"

    # phones off: digits survive, count stays 0
    off = {r.doc_id: r for r in
           curation.scrub_text_pii(docs, scrub_phones=False).collect()}
    assert "555-123-4567" in off[3].scrubbed_text and off[3].n_phones == 0


def test_stratified_sample(spark):
    """Hash-deterministic per-stratum sampling: reproducible across
    runs/partitionings, fraction ≈ requested, unlisted strata drop."""
    from enrich_spark.datapipe import curation

    docs = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "web").otherwise("books").alias("source"),
    )
    out = curation.stratified_sample(
        docs, {"web": 0.25, "books": 0.75}, seed=7)
    got = {r[0]: r[1] for r in
           out.groupBy("source").count().collect()}
    assert abs(got["web"] / 2000 - 0.25) < 0.05
    assert abs(got["books"] / 2000 - 0.75) < 0.05
    # deterministic: same ids survive on a different partitioning
    ids1 = {r.doc_id for r in out.collect()}
    ids2 = {r.doc_id for r in curation.stratified_sample(
        docs.repartition(7), {"web": 0.25, "books": 0.75}, seed=7).collect()}
    assert ids1 == ids2
    # different seed → different set; unlisted stratum drops entirely
    ids3 = {r.doc_id for r in curation.stratified_sample(
        docs, {"web": 0.25, "books": 0.75}, seed=8).collect()}
    assert ids1 != ids3
    assert curation.stratified_sample(docs, {"web": 0.5}).where(
        "source = 'books'").count() == 0


def test_pack_sequences(spark):
    """Fixed-budget packing: bins are cumsum // budget per group, the
    straddler stays where its prefix began, oversized docs bin alone,
    seq_pos is the in-sequence order."""
    from enrich_spark.datapipe import curation

    docs = spark.createDataFrame([
        # group a: tokens 6, 6, 6 with budget 10 → cum_before 0,6,12 →
        # bins 0,0,1 (doc 2 straddles and stays in bin 0)
        (1, "a", "w w w w w w"),
        (2, "a", "x x x x x x"),
        (3, "a", "y y y y y y"),
        # group b: an oversized doc (25 tokens) then a small one:
        # cum_before 0,25 → bins 0,2
        (10, "b", " ".join(["z"] * 25)),
        (11, "b", "q q"),
    ], "doc_id INT, source STRING, text STRING")
    got = {r.doc_id: r for r in
           curation.pack_sequences(docs, budget_tokens=10).collect()}
    assert got[1].seq_id == "a#0" and got[1].seq_pos == 0
    assert got[2].seq_id == "a#0" and got[2].seq_pos == 1
    assert got[3].seq_id == "a#1" and got[3].seq_pos == 0
    assert got[10].seq_id == "b#0" and got[10].n_tokens == 25
    assert got[11].seq_id == "b#2" and got[11].seq_pos == 0
    # single-group mode
    one = curation.pack_sequences(docs, 100, group_col=None)
    assert {r.seq_id for r in one.collect()} == {"all#0"}


def test_score_linear_model(spark):
    """fasttext-style linear scoring: map-literal and broadcast-join
    vocab paths agree; hits/normalization behave; OOV-only docs sit at
    sigmoid(bias)."""
    import math

    from enrich_spark.datapipe import curation

    w = {"good": 2.0, "great": 3.0, "bad": -2.0, "awful": -4.0}
    docs = spark.createDataFrame([
        (1, "a good and great read"),
        (2, "bad awful terrible stuff"),
        (3, "totally neutral words only"),
        (4, ""),
    ], "doc_id INT, text STRING")

    lit = {r.doc_id: r for r in
           curation.score_linear_model(docs, w).collect()}
    assert lit[1].n_hits == 2 and lit[1].score > 0.7
    assert lit[2].n_hits == 2 and lit[2].score < 0.3
    assert lit[3].n_hits == 0
    assert math.isclose(lit[3].score, 0.5)  # sigmoid(0 + 0)
    assert math.isclose(lit[1].score,
                        1 / (1 + math.exp(-(2.0 + 3.0) / 5)))

    wdf = spark.createDataFrame(list(w.items()), "token STRING, weight DOUBLE")
    joined = {r.doc_id: r for r in
              curation.score_linear_model(docs, wdf).collect()}
    for d in (1, 2, 3, 4):
        assert joined[d].n_hits == lit[d].n_hits
        assert math.isclose(joined[d].score, lit[d].score, rel_tol=1e-9)

    # bias shifts the OOV baseline; normalize=False uses the raw sum
    b = {r.doc_id: r.score for r in
         curation.score_linear_model(docs, w, bias=1.0).collect()}
    assert math.isclose(b[3], 1 / (1 + math.exp(-1.0)))
    raw = {r.doc_id: r.score for r in
           curation.score_linear_model(docs, w, normalize=False).collect()}
    assert math.isclose(raw[1], 1 / (1 + math.exp(-5.0)))


def test_dedup_and_packing_invariants_random_corpus(spark):
    """Seeded random corpus: structural invariants that must hold for
    ANY input — span bookkeeping consistency, packing bin arithmetic,
    sampling subset determinism."""
    import random

    from enrich_spark.datapipe import curation

    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(30)]
    run = " ".join(rng.choice(vocab) for _ in range(12))
    rows = []
    for i in range(120):
        words = [rng.choice(vocab) for _ in range(rng.randint(1, 40))]
        if i % 3 == 0:
            words = words[:5] + run.split() + words[5:]
        rows.append((i, f"s{i % 4}", " ".join(words)))
    rows.append((120, "s0", ""))  # empty text: the [''] split artifact
    docs = spark.createDataFrame(rows, "doc_id INT, source STRING, text STRING")

    # remove_duplicate_spans bookkeeping: removed + kept == total, and
    # the cleaned text has exactly the kept words (the empty doc counts
    # one empty-string "word" — split('') semantics, same in the oracle)
    for r in dedup.remove_duplicate_spans(docs, k=8).collect():
        kept = len(r.cleaned_text.split()) if r.cleaned_text else 0
        if r.doc_id == 120:
            assert (r.n_words, r.removed_words, kept) == (1, 0, 0)
        else:
            assert r.n_words - r.removed_words == kept
        assert 0 <= r.removed_words <= r.n_words

    # spans are sorted, non-overlapping, within the doc (last window
    # starts at n_words-k+1 = n_windows, so end ≤ n_windows + k - 1)
    for r in dedup.duplicate_substring_windows(docs, k=8).collect():
        prev_end = 0
        for s in r.dup_spans:
            assert s.start > prev_end and s.end >= s.start
            assert s.end <= r.n_windows + 8 - 1
            prev_end = s.end

    # packing: bin index == floor(cum_before / budget); positions are
    # 0..n-1 contiguous per sequence
    budget = 64
    packed = curation.pack_sequences(docs, budget).collect()
    by_group = {}
    for r in sorted(packed, key=lambda r: (r.group, r.doc_id)):
        cum = by_group.get(r.group, 0)
        assert r.seq_id == f"{r.group}#{cum // budget}"
        by_group[r.group] = cum + r.n_tokens
    by_seq = {}
    for r in packed:
        by_seq.setdefault(r.seq_id, []).append(r.seq_pos)
    for poss in by_seq.values():
        assert sorted(poss) == list(range(len(poss)))

    # sampling is a deterministic subset
    kept = curation.stratified_sample(docs, {"s0": 0.5, "s1": 1.0})
    ids = {r.doc_id for r in kept.collect()}
    assert ids <= {r[0] for r in rows}
    assert {r.doc_id for r in kept.collect()} == ids
    assert all(i % 4 != 2 and i % 4 != 3 for i in ids)  # default 0 drops


def test_corpus_stats(spark):
    """Per-group rollup: totals, exact interpolated percentiles, and
    within-group duplicate count."""
    docs = spark.createDataFrame(
        [(1, "a", "x y z"), (2, "a", "x y z"), (3, "a", "one two"),
         (4, "a", "w1 w2 w3 w4 w5 w6"), (5, "b", "solo words here now")],
        "doc_id INT, source STRING, text STRING")
    got = {r.group: r for r in text.corpus_stats(docs).collect()}
    a = got["a"]
    assert a.n_docs == 4 and a.total_tokens == 3 + 3 + 2 + 6
    assert a.dup_docs == 1  # docs 1,2 identical
    # exact linear interpolation over [2,3,3,6]: p50 = 3.0, p90 = 5.1
    assert a.p50_tokens == 3.0
    assert abs(a.p90_tokens - 5.1) < 1e-9
    assert got["b"].n_docs == 1 and got["b"].dup_docs == 0


def test_lsh_topk_multiprobe_superset(spark):
    """Multiprobe adds Hamming-1 query buckets: with k large enough to
    keep every candidate, the probed candidate set contains the plain
    one — more recall, same rescoring exactness."""
    import random

    rng = random.Random(5)
    vecs = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)],
        "vec_id INT, embedding ARRAY<DOUBLE>")
    q = vecs.where("vec_id < 2").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    kw = dict(dim=8, k=60, num_tables=2, bits=4)
    plain = {(r.query_id, r.vec_id) for r in
             similarity.lsh_topk(vecs, q, **kw).collect()}
    probe = {(r.query_id, r.vec_id) for r in
             similarity.lsh_topk(vecs, q, multiprobe=4, **kw).collect()}
    assert plain <= probe
    assert len(probe) > len(plain)  # the extra buckets found someone new


def test_lsh_plain_probe_shared_pass_matches_two_searches(spark):
    """r14: the shared-candidate plain+probe forms (two-frame AND
    part-tagged single-frame) must be row-identical to two independent
    lsh_topk searches — the optimization removes a duplicated corpus
    pass, never a row."""
    import random

    rng = random.Random(11)
    vecs = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(80)],
        "vec_id INT, embedding ARRAY<DOUBLE>")
    q = vecs.where("vec_id < 3").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    kw = dict(dim=8, k=5, num_tables=3, bits=4, round_digits=4)

    def rows(df):
        return {(r.query_id, r.vec_id, r.cosine_sim) for r in df.collect()}

    want_plain = rows(similarity.lsh_topk(vecs, q, **kw))
    want_probe = rows(similarity.lsh_topk(vecs, q, multiprobe=2, **kw))
    got_plain, got_probe = similarity.lsh_topk_plain_probe(
        vecs, q, multiprobe=2, **kw)
    assert rows(got_plain) == want_plain
    assert rows(got_probe) == want_probe

    tagged = similarity.lsh_topk_plain_probe_tagged(
        vecs, q, multiprobe=2, **kw).collect()
    got_by_part = {"plain": set(), "probe": set()}
    for r in tagged:
        got_by_part[r.part].add((r.query_id, r.vec_id, r.cosine_sim))
    assert got_by_part["plain"] == want_plain
    assert got_by_part["probe"] == want_probe


def test_jpeg_sos_undefined_huffman_table_is_value_error():
    """A scan referencing a never-defined Huffman table must raise the
    documented ValueError at SOS parse time — not an AttributeError on
    the None table deep in the entropy decode (ADVICE r6)."""
    import numpy as np
    import pytest

    from enrich_spark.datapipe.jpeg import decode_jpeg, encode_jpeg

    b = bytearray(encode_jpeg(16, 16, np.full((16, 16, 3), 77, np.uint8),
                              quality=90))
    i = b.find(b"\xff\xda")
    b[i + 6] = 0x33  # comp0 -> DC table 3 / AC table 3, never defined
    with pytest.raises(ValueError, match="undefined DC Huffman"):
        decode_jpeg(bytes(b))


def test_scrub_financial_pii_luhn(spark):
    from enrich_spark.datapipe.curation import scrub_financial_pii

    rows = [
        (1, "pay with 4111 1111 1111 1111 now"),          # Luhn-valid Visa test PAN
        (2, "order id 4111 1111 1111 1112 shipped"),      # fails Luhn -> untouched
        (3, "card 5500-0000-0000-0004 and ssn 123-45-6789"),
        (4, "amex 378282246310005 inline"),
        (5, "no pii here, just the number 12345"),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {r.doc_id: r for r in scrub_financial_pii(df).collect()}
    assert out[1].n_ccs == 1 and "<CC>" in out[1].scrubbed_text
    assert "4111" not in out[1].scrubbed_text
    assert out[2].n_ccs == 0 and out[2].n_cc_cands == 1
    assert "1112" in out[2].scrubbed_text                  # invalid left alone
    assert out[3].n_ccs == 1 and out[3].n_ssns == 1
    assert "<SSN>" in out[3].scrubbed_text and "6789" not in out[3].scrubbed_text
    assert out[4].n_ccs == 1                               # 15-digit Amex
    assert out[5].n_ccs == 0 and out[5].n_cc_cands == 0 and out[5].n_ssns == 0
    assert out[5].scrubbed_text == rows[4][1]


def test_domain_mix_weights(spark):
    from enrich_spark.datapipe.curation import domain_mix_weights

    rows = ([(i, "web") for i in range(100)]
            + [(i + 100, "books") for i in range(9)]
            + [(200, "code")])
    df = spark.createDataFrame(rows, "doc_id INT, source STRING")
    out = {r.source: r for r in
           domain_mix_weights(df, budget_docs=1000).collect()}
    # isqrt: web=10, books=3, code=1 -> total 14
    assert out["web"].isqrt_n == 10 and out["books"].isqrt_n == 3
    assert out["web"].weight_bp == 10 * 10000 // 14
    assert out["books"].weight_bp == 3 * 10000 // 14
    assert out["code"].weight_bp == 1 * 10000 // 14
    # smoothing: books' mix share (21.4%) >> its corpus share (8.2%)
    assert out["books"].weight_bp > 9 * 10000 // 110
    # epochs: budget 1000 at weight w_bp over n docs = w_bp*1000/(10000*n) epochs
    assert out["code"].epochs_mbp == 1000 * out["code"].weight_bp // 10
    assert out["web"].epochs_mbp == 1000 * out["web"].weight_bp // (10 * 100)


def test_apply_dedup_policy_quality_keeper(spark):
    from enrich_spark.datapipe.dedup import apply_dedup_policy

    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.5), (4, 0.1), (5, 0.7)],
        "doc_id INT, q DOUBLE")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a INT, id_b INT")     # {1,2,3} one cluster
    out = {r.doc_id: r for r in
           apply_dedup_policy(docs, pairs, quality_col="q").collect()}
    assert out[1].cluster_id == out[2].cluster_id == out[3].cluster_id == 1
    assert out[2].is_kept == 1                       # best quality wins
    assert out[1].is_kept == 0 and out[3].is_kept == 0
    assert out[1].cluster_size == 3
    assert out[4].is_kept == 1 and out[4].cluster_size == 1   # singleton
    assert out[5].is_kept == 1

    # no-quality default: lowest id survives
    out2 = {r.doc_id: r for r in apply_dedup_policy(docs, pairs).collect()}
    assert out2[1].is_kept == 1 and out2[2].is_kept == 0


def test_html_extract(spark):
    from enrich_spark.datapipe.webtext import html_extract

    rows = [
        (1, '<html><head><script>var x = "<p>"; </script><style>p{}</style>'
            '</head><body><h1>Title</h1><p>Hello &amp; welcome to a page '
            'with enough actual prose that the text density clears the '
            'boilerplate gate comfortably</p>'
            '<div>Second &lt;line&gt;</div></body></html>'),
        (2, '<ul><li><a href="/a">Home</a></li><li><a href="/b">About</a>'
            '</li><li><a href="/c">More links</a></li></ul><p>x</p>'),
        (3, 'no markup at all'),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, html STRING")
    out = {r.doc_id: r for r in html_extract(df).collect()}
    # adjacent block close+open => blank line between blocks (paragraph
    # separation preserved; runs of 3+ newlines collapse to exactly 2)
    assert out[1].extracted_text == (
        "Title\n\nHello & welcome to a page with enough actual prose that "
        "the text density clears the boilerplate gate comfortably"
        "\n\nSecond <line>")
    assert out[1].n_links == 0 and out[1].is_boilerplate == 0
    # page 2 is nav chrome: high link density
    assert out[2].n_links == 3
    assert out[2].anchor_chars == len("Home") + len("About") + len("More links")
    assert out[2].is_boilerplate == 1
    assert out[3].extracted_text == "no markup at all"
    assert out[3].n_tags == 0 and out[3].text_density_bp == 10000


# ---------------------------------------------------------------------------
# BPE tokenizer (datapipe/bpe.py)


_BPE_DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cats sat"),
    (3, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),   # 32-run: pass-count stress
    (4, "ab ab ab ab ababab abab"),            # adjacent-merge stress
    (5, ""),
    (6, "!!! ??? ..."),                        # normalizes to empty
    (7, "Mixed CASE, punct-uation; and 123 numbers!"),
]


def _bpe_docs(spark):
    return spark.createDataFrame(_BPE_DOCS, "doc_id INT, text STRING")


def test_bpe_train_deterministic_and_golden(spark):
    from enrich_spark.datapipe import bpe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = bpe.train_bpe(docs, num_merges=48)
    assert merges == bpe.train_bpe(docs, num_merges=48)
    # the entry file embeds this exact table as _BPE_MERGES
    import __spark_entry__ as entry

    assert [tuple(m) for m in entry._BPE_MERGES] == merges
    # corpus vocabulary should surface as whole-word merges
    merged_syms = {a + b for a, b in merges}
    assert {"scan_", "column_", "window_", "join_"} <= merged_syms


def test_bpe_apply_matches_python_reference(spark):
    from enrich_spark.datapipe import bpe

    # train on the tiny inline corpus so merges hit the stress docs
    docs = _bpe_docs(spark)
    merges = bpe.train_bpe(docs, num_merges=12)
    out = {r.doc_id: r for r in bpe.apply_bpe(docs, merges).collect()}
    for doc_id, raw in _BPE_DOCS:
        toks = bpe.tokenize_py(raw, merges)
        assert out[doc_id].n_tokens == len(toks), (doc_id, merges)
        assert out[doc_id].tokens_head == " ".join(toks)[:160]
    assert out[5].n_words == 0 and out[5].n_tokens == 0
    assert out[6].n_words == 0 and out[6].n_tokens == 0


def test_bpe_run_merges_match_reference(spark):
    from enrich_spark.datapipe import bpe

    # self-pair merges over long runs are where a naive separator-only
    # encoding (/a/b/) permanently diverges from leftmost-greedy BPE —
    # the /sym; self-contained encoding must match the reference exactly
    docs = spark.createDataFrame(
        [(1, "a" * 32), (2, "a" * 7)], "doc_id INT, text STRING")
    merges = [("a", "a"), ("aa", "aa")]
    out = {r.doc_id: r for r in bpe.apply_bpe(docs, merges).collect()}
    for doc_id, raw in ((1, "a" * 32), (2, "a" * 7)):
        toks = bpe.tokenize_py(raw, merges)
        assert out[doc_id].n_tokens == len(toks)
        assert out[doc_id].tokens_head == " ".join(toks)[:160]


def test_bpe_duckdb_oracle_parity(spark):
    import duckdb

    from enrich_spark.datapipe import bpe

    docs = _bpe_docs(spark)
    merges = bpe.train_bpe(docs, num_merges=12)
    srows = sorted(
        (r.doc_id, r.n_words, r.n_tokens, r.tokens_head)
        for r in bpe.apply_bpe(docs, merges).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", _BPE_DOCS)
    q = bpe.apply_bpe_sql("d", "doc_id", "text", merges)
    drows = sorted(tuple(t) for t in con.execute(q).fetchall())
    assert drows == srows


def test_bpe_word_freqs_single_shuffle(spark):
    from enrich_spark.datapipe import bpe

    docs = _bpe_docs(spark)
    plan = bpe.word_freqs(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1      # groupBy(word) only
    assert "partial_count" in plan          # map-side combine


# ---------------------------------------------------------------------------
# URL canonicalization (datapipe/webtext.url_normalize)


_URLS = [
    (1, "HTTP://WWW.Example.CO.UK:80/Path//To/page/?utm_source=x&b=2&a=1&gclid=zz#frag"),
    (2, "https://sub.shop.example.com:443/"),
    (3, "https://example.com:8443/a/b/c?z=1&y=2&utm_campaign=s"),
    (4, "http://example.org"),
    (5, "https://www.foo.com.au/x/?ref=tw"),
    (6, "http://localhost:8080/test?x=1"),
]


def test_url_normalize_semantics(spark):
    from enrich_spark.datapipe import webtext as wt

    df = spark.createDataFrame(_URLS, "doc_id INT, url STRING")
    out = {r.doc_id: r for r in wt.url_normalize(df).collect()}
    # case, www, default port, dup slashes, trailing slash, tracking
    # params, param sort, fragment — all normalized in one pass
    assert out[1].canonical_url == "http://example.co.uk/Path/To/page?a=1&b=2"
    assert out[1].reg_domain == "example.co.uk"      # multi-label suffix
    assert out[1].n_tracking == 2 and out[1].n_params == 2
    assert out[2].canonical_url == "https://sub.shop.example.com/"
    assert out[2].reg_domain == "example.com"
    assert out[3].canonical_url == "https://example.com:8443/a/b/c?y=2&z=1"
    assert out[4].canonical_url == "http://example.org/"
    assert out[5].canonical_url == "https://foo.com.au/x"
    assert out[6].reg_domain == ""                   # dotless host
    assert out[6].canonical_url == "http://localhost:8080/test?x=1"


def test_url_normalize_duckdb_parity(spark):
    import duckdb

    from enrich_spark.datapipe import webtext as wt

    df = spark.createDataFrame(_URLS, "doc_id INT, url STRING")
    srows = sorted(tuple(r) for r in wt.url_normalize(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE u (doc_id INT, url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?, ?)", _URLS)
    drows = sorted(tuple(t) for t in con.execute(
        wt.url_normalize_sql("u", "doc_id", "url")).fetchall())
    assert drows == srows


# ---------------------------------------------------------------------------
# k-means clustering (datapipe/similarity.cluster_assign / cluster_stats)


def test_cluster_assign_separable(spark):
    # two orthogonal bundles: every vector must land on its own axis
    vecs = spark.createDataFrame(
        [(i, [1.0, 0.0, float(i % 3) * 0.01]) for i in range(10)]
        + [(i, [0.0, 1.0, float(i % 3) * 0.01]) for i in range(10, 20)],
        "vec_id INT, embedding ARRAY<DOUBLE>")
    cents = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]
    out = {r.vec_id: r for r in similarity.cluster_assign(vecs, cents).collect()}
    assert all(out[i].cid == 0 for i in range(10))
    assert all(out[i].cid == 1 for i in range(10, 20))
    assert all(9990 <= out[i].sim_bp <= 10000 for i in range(20))


def test_cluster_assign_tie_breaks_low_cid(spark):
    vecs = spark.createDataFrame(
        [(1, [1.0, 1.0])], "vec_id INT, embedding ARRAY<DOUBLE>")
    cents = [(3, [1.0, 0.0]), (7, [0.0, 1.0])]
    out = similarity.cluster_assign(vecs, cents).collect()[0]
    assert out.cid == 3  # equal cosine, lower cid wins


def test_cluster_stats_partition_of_corpus(spark):
    import random

    rng = random.Random(5)
    vecs = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(200)],
        "vec_id INT, embedding ARRAY<DOUBLE>")
    cents = similarity.train_centroids(vecs, n_centroids=4, sample=200)
    stats = similarity.cluster_stats(vecs, cents).collect()
    assert sum(r.n for r in stats) == 200          # exact partition
    for r in stats:
        assert r.min_sim_bp <= r.mean_sim_bp <= r.max_sim_bp
        assert r.mean_sim_bp == r.sum_sim_bp // r.n  # floor-div contract


def test_cluster_assign_is_map_side(spark):
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id INT, embedding ARRAY<DOUBLE>")
    plan = (similarity.cluster_assign(vecs, [(0, [1.0, 0.0])])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Join" not in plan


def test_semantic_dedup_keeps_min_id_per_group(spark):
    import math
    import random

    # cluster 0 (x-axis): ids 0,1,2 nearly identical + id 3 distinct;
    # cluster 1 (y-axis): ids 10,11 nearly identical
    rows = [(0, [1.0, 0.0, 0.0]), (1, [0.999, 0.001, 0.0]),
            (2, [0.998, 0.002, 0.0]), (3, [0.8, 0.0, 0.6]),
            (10, [0.0, 1.0, 0.0]), (11, [0.001, 0.999, 0.0])]
    vecs = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    cents = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]
    out = {r.vec_id: r for r in similarity.semantic_dedup(
        vecs, cents, threshold=0.99).collect()}
    assert [i for i in sorted(out) if out[i].is_kept] == [0, 3, 10]
    assert out[1].n_dups == 1 and out[2].n_dups == 2
    assert out[3].n_dups == 0 and out[3].max_sim == -1.0
    # brute-force replay of the keep rule
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(d / (math.sqrt(sum(x * x for x in a))
                          * math.sqrt(sum(x * x for x in b))), 4)
    byid = dict(rows)
    for i, r in out.items():
        exp_dups = [j for j, v in rows if j < i and out[j].cid == r.cid
                    and cos(byid[i], v) >= 0.99]
        assert r.n_dups == len(exp_dups)
        assert bool(r.is_kept) == (not exp_dups)


def test_semantic_dedup_pairs_join_is_cluster_bounded(spark):
    # the pair join must key on cid (no cartesian / BNLJ anywhere)
    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id INT, embedding ARRAY<DOUBLE>")
    plan = (similarity.semantic_dedup(vecs, [(0, [1.0, 0.0])])
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# C4 heuristic filters (datapipe/curation.c4_filters)


_C4_DOCS = [
    (1, "This is a good sentence with seven words.\nShort line\n"
        "Another proper sentence right here with words!\n"
        "And a third full sentence for the doc."),
    (2, "function f() { return 1; }\nGood sentence here with five words."),
    (3, "Lorem Ipsum dolor sit amet something.\nMore words in a sentence here."),
    (4, "Please enable JavaScript to view this page.\n"
        "Some other sentence with enough words here."),
    (5, ""),
    (6, "No terminal punctuation at all\njust words"),
]


def test_c4_filters_semantics(spark):
    from enrich_spark.datapipe.curation import c4_filters

    df = spark.createDataFrame(_C4_DOCS, "doc_id INT, text STRING")
    out = {r.doc_id: r for r in c4_filters(df).collect()}
    assert out[1].is_kept == 1 and out[1].n_kept_lines == 3
    assert out[1].n_lines == 4          # the short line is dropped
    assert out[2].is_kept == 0 and out[2].has_brace == 1
    assert out[3].is_kept == 0 and out[3].has_lorem == 1
    assert out[4].is_kept == 0 and out[4].has_jswarn == 1
    assert out[5].is_kept == 0 and out[5].n_kept_lines == 0
    assert out[6].is_kept == 0 and out[6].n_sentences == 0


def test_c4_filters_duckdb_parity(spark):
    import duckdb

    from enrich_spark.datapipe.curation import c4_filters, c4_filters_sql

    df = spark.createDataFrame(_C4_DOCS, "doc_id INT, text STRING")
    srows = sorted(tuple(r) for r in c4_filters(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", _C4_DOCS)
    drows = sorted(tuple(t) for t in con.execute(
        c4_filters_sql("d", "doc_id", "text")).fetchall())
    assert drows == srows


# ---------------------------------------------------------------------------
# RAG chunking (datapipe/curation.chunk_documents)


def test_chunk_documents_semantics(spark):
    from enrich_spark.datapipe.curation import chunk_documents

    df = spark.createDataFrame(
        [(1, "First sentence here. Second one follows! Third is a "
             "question? Fourth keeps going with more words. Fifth ends"),
         (2, ""), (3, "no punctuation twelve words " * 3)],
        "doc_id INT, text STRING")
    out = chunk_documents(df, chunk_tokens=8).collect()
    by = {}
    for r in out:
        by.setdefault(r.doc_id, []).append(r)
    c1 = sorted(by[1], key=lambda r: r.chunk_id)
    # sentence-aligned: first chunk takes 3 sentences (10 tokens,
    # overflow-by-one allowed), never splits mid-sentence
    assert c1[0].n_sentences == 3 and c1[0].n_tokens == 10
    assert c1[0].chunk_text.startswith("First sentence here. Second")
    assert 2 not in by                    # empty doc → no chunks
    assert len(by[3]) == 1                # unpunctuated remnant = 1 sent
    # token mass is partitioned exactly
    assert sum(r.n_tokens for r in by[1]) == 18


def test_chunk_documents_duckdb_parity(spark):
    import duckdb

    from enrich_spark.datapipe.curation import (
        chunk_documents, chunk_documents_sql,
    )

    cases = [(1, "A b c. D e f! G h? " * 10), (2, "One short doc."),
             (3, "x " * 300)]
    df = spark.createDataFrame(cases, "doc_id INT, text STRING")
    srows = sorted(tuple(r) for r in chunk_documents(df, 16).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", cases)
    drows = sorted(tuple(t) for t in con.execute(
        chunk_documents_sql("d", "doc_id", "text", 16)).fetchall())
    assert drows == srows


# ---------------------------------------------------------------------------
# BM25 (datapipe/text.bm25_score)


def test_bm25_semantics(spark):
    from enrich_spark.datapipe.text import bm25_score

    df = spark.createDataFrame(
        [(1, "spark spark spark window"), (2, "spark window"),
         (3, "nothing relevant here"), (4, "")],
        "doc_id INT, text STRING")
    out = {r.doc_id: r for r in bm25_score(df, ["spark", "window"]).collect()}
    # tf saturation: doc 1 has 3x 'spark' but must NOT score 3x doc 2
    assert out[1].bm25 > out[2].bm25
    assert out[1].bm25 < 3 * out[2].bm25
    assert out[3].bm25 == 0.0 and out[3].n_hit_terms == 0
    assert out[4].bm25 == 0.0
    assert out[1].n_hit_terms == 2
    # rarer term scores higher: 'window' appears in 2 docs, 'spark' in 2
    # — equal df here, so doc 2's two singleton tfs beat one doc's pair
    assert out[2].n_hit_terms == 2


def test_bm25_duckdb_parity(spark):
    import duckdb

    from enrich_spark.datapipe.text import bm25_score, bm25_score_sql

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    terms = ["window", "join", "scan", "zebra"]
    srows = sorted(tuple(r) for r in bm25_score(docs, terms).collect())
    q = bm25_score_sql(
        "read_parquet('/root/testdata/sf0.001/documents.parquet')",
        "doc_id", "text", terms)
    drows = sorted(tuple(t) for t in duckdb.sql(q).fetchall())
    assert drows == srows


# ---------------------------------------------------------------------------
# sketches (datapipe/sketches.py) — contract is the error bound


def test_approx_distinct_error_bound(spark):
    from enrich_spark.datapipe.sketches import approx_distinct

    df = spark.range(50000).select(
        (F.col("id") % 4).alias("g"), (F.col("id") % 7919).alias("v"))
    exact = {r.g: r.n for r in df.groupBy("g").agg(
        F.countDistinct("v").alias("n")).collect()}
    approx = {r.g: r.approx_distinct
              for r in approx_distinct(df, ["g"], "v", rsd=0.02).collect()}
    for g, n in exact.items():
        assert abs(approx[g] - n) / n < 0.08  # 4 sigma of rsd=2%


def test_approx_quantiles_rank_bound(spark):
    from enrich_spark.datapipe.sketches import approx_quantiles

    df = spark.range(100000).select(F.lit("a").alias("g"),
                                    F.col("id").alias("v"))
    row = approx_quantiles(df, ["g"], "v", [0.5, 0.9]).collect()[0]
    assert abs(row.q_0_5 - 50000) <= 100000 / 10000 + 1
    assert abs(row.q_0_9 - 90000) <= 100000 / 10000 + 1


def test_heavy_hitters_exact_vs_groupby(spark):
    # skewed synthetic: a handful of hot values + a long uniform tail
    from enrich_spark.datapipe.sketches import heavy_hitters

    df = spark.range(40000).select(
        F.when(F.col("id") % 100 < 60, F.concat(F.lit("hot_"),
                                                (F.col("id") % 3)))
        .otherwise(F.concat(F.lit("cold_"), (F.col("id") % 5000)))
        .alias("v")).repartition(16)
    got = {(r.v, r.cnt) for r in heavy_hitters(df, "v", support=0.01).collect()}
    thr = math.ceil(40000 * 0.01)
    want = {(r.v, r.cnt) for r in df.groupBy("v")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") >= thr).collect()}
    assert got == want and len(want) == 3


def test_heavy_hitters_k_guard(spark):
    from enrich_spark.datapipe.sketches import heavy_hitters

    df = spark.range(10).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError):
        heavy_hitters(df, "v", support=0.001, k=10)


# ---------------------------------------------------------------------------
# audio features (datapipe/multimodal.audio_features)


def test_audio_features_sine_detection():
    import numpy as np

    from enrich_spark.datapipe.media_codecs import encode_wav
    from enrich_spark.datapipe.multimodal import audio_feature_row

    # on-bin tone, k coprime to N (no exact-zero samples): all features
    # analytically predictable
    N, rate, k, A = 2000, 8000, 111, 8000
    t = np.arange(N)
    sig = (A * np.sin(2 * np.pi * k * t / N)).astype("<i2")
    rec = audio_feature_row(encode_wav(rate, sig))
    assert rec["dominant_bin"] == k
    assert rec["dominant_freq_mhz"] == k * rate * 1000 // N  # 444 Hz
    assert abs(rec["rms"] - A / np.sqrt(2)) < 10
    assert abs(rec["zcr"] - 2 * k) <= 2
    assert abs(rec["spectral_centroid_mhz"] - 444_000) < 2_000
    # stereo collapses to mono mean
    stereo = np.column_stack([sig, sig]).reshape(-1)
    rec2 = audio_feature_row(encode_wav(rate, stereo, channels=2))
    assert rec2["channels"] == 2 and rec2["dominant_bin"] == k


def test_audio_features_errors_are_rows(spark):
    import pandas as pd

    from enrich_spark.datapipe.media_codecs import encode_wav
    from enrich_spark.datapipe.multimodal import audio_features
    import numpy as np

    good = encode_wav(8000, (1000 * np.sin(
        2 * np.pi * 50 * np.arange(400) / 400)).astype("<i2"))
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [1, 2], "media": [good, b"garbage"]}))
    out = {r.doc_id: r for r in audio_features(df).collect()}
    assert out[1].audio_error is None and out[1].dominant_bin == 50
    assert out[2].audio_error is not None and out[2].rate is None


# ---------------------------------------------------------------------------
# end-to-end curation pipeline composition


def test_curation_pipeline_composes(spark):
    """The full pretraining-curation chain composes on real corpus
    data: C4 filter → near-dup keep-policy → chunk → BPE tokenize →
    sequence packing. Row-count and mass invariants hold at every
    stage."""
    from enrich_spark.datapipe.bpe import apply_bpe, train_bpe
    from enrich_spark.datapipe.curation import (
        c4_filters, chunk_documents, pack_sequences,
    )
    from enrich_spark.datapipe.dedup import (
        apply_dedup_policy, ngram_jaccard_pairs,
    )

    raw = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    # the synthetic corpus is unpunctuated single-line text (C4 would
    # rightly drop all of it) — give it sentence structure: a period +
    # newline every 12 words, terminal period
    docs = raw.select(
        "doc_id", "source", "n_chars",
        F.concat(
            F.regexp_replace(F.col("text"), r"((?:\S+ ){11}\S+) ", "$1.\n"),
            F.lit("."),
        ).alias("text"))
    n_docs = docs.count()

    # 1. C4 quality gate
    kept_ids = c4_filters(docs).where(F.col("is_kept") == 1).select("doc_id")
    docs1 = docs.join(kept_ids, "doc_id")
    n1 = docs1.count()
    assert 0 < n1 <= n_docs

    # 2. near-dup keep-policy (quality = n_chars)
    pairs = ngram_jaccard_pairs(docs1, shingle_k=3, threshold=0.3)
    policy = apply_dedup_policy(docs1, pairs, quality_col="n_chars")
    docs2 = docs1.join(
        policy.where(F.col("is_kept") == 1).select("doc_id"), "doc_id")
    n2 = docs2.count()
    assert 0 < n2 <= n1
    assert policy.count() == n1          # verdict covers every doc

    # 3. chunk for retrieval; token mass partitioned exactly
    chunks = chunk_documents(docs2, chunk_tokens=64)
    assert chunks.where(F.col("n_tokens") <= 0).count() == 0

    # 4. BPE-tokenize the chunks with a corpus-trained table
    merges = train_bpe(docs2, num_merges=16)
    toks = apply_bpe(chunks.select(
        F.concat_ws("#", "doc_id", "chunk_id").alias("doc_id"),
        F.col("chunk_text").alias("text")), merges, id_col="doc_id")
    assert toks.count() == chunks.count()
    # BPE merges only ever reduce whitespace-token → subword counts
    # vs characters: n_tokens ≤ chars+words
    bad = toks.where(F.col("n_tokens") <= 0).count()
    assert bad == 0

    # 5. pack into training sequences; every chunk placed exactly once
    packed = pack_sequences(
        toks.select(F.col("doc_id"), F.lit("all").alias("source"),
                    F.col("n_tokens"), F.lit("x").alias("text")),
        budget_tokens=512, token_col="n_tokens")
    assert packed.count() == toks.count()
    assert packed.select("seq_id").distinct().count() >= 1


# ---------------------------------------------------------------------------
# k-anonymity audit (datapipe/curation.k_anonymity_audit)


def test_k_anonymity_audit_flags_small_classes(spark):
    from enrich_spark.datapipe import curation

    rows = ([("35-39", "eng", "flu")] * 6
            + [("35-39", "law", "flu"), ("35-39", "law", "cold")]
            + [("40-44", "med", "flu")])
    df = spark.createDataFrame(rows, "age STRING, job STRING, dx STRING")
    out = {(r.age, r.job): r for r in curation.k_anonymity_audit(
        df, ["age", "job"], k=5, sensitive_col="dx").collect()}
    big = out[("35-39", "eng")]
    assert big.n == 6 and big.at_risk == 0
    assert big.l_div == 1 and big.homogeneous == 1   # homogeneity leak
    small = out[("35-39", "law")]
    assert small.n == 2 and small.at_risk == 1 and small.l_div == 2
    assert out[("40-44", "med")].at_risk == 1


def test_k_anonymity_report_and_generalization(spark):
    from enrich_spark.datapipe import curation
    from enrich_spark.datapipe.curation import (generalize_numeric,
                                                generalize_prefix)

    # raw zip+age is fully identifying; generalizing must cut risk
    rows = [(i, f"9410{i % 10}", 20 + i % 37) for i in range(100)]
    df = spark.createDataFrame(rows, "id INT, zip STRING, age INT")
    raw = curation.k_anonymity_report(df, ["zip", "age"], k=5).collect()[0]
    gen = curation.k_anonymity_report(
        df.select(generalize_prefix(F.col("zip"), 4).alias("zip3"),
                  generalize_numeric(F.col("age"), 10).alias("age_band")),
        ["zip3", "age_band"], k=5).collect()[0]
    assert raw.at_risk_rows > gen.at_risk_rows
    assert gen.at_risk_classes == 0          # generalized classes all ≥ 5
    assert raw.total_rows == gen.total_rows == 100
    assert 0 <= raw.risk_bp <= 10000 and gen.risk_bp == 0


# ---------------------------------------------------------------------------
# robots.txt parsing + crawl-frontier filter (datapipe/webtext)


_ROBOTS = """
# example file
User-agent: googlebot
Disallow: /private/

User-agent: *
Disallow: /admin/
Allow: /admin/public/
Disallow: /tmp*
Disallow: /exact$
Crawl-delay: 10
"""


def test_parse_robots_rules_groups_and_agent_choice(spark):
    from enrich_spark.datapipe.webtext import parse_robots_rules

    robots = spark.createDataFrame(
        [("example.com", _ROBOTS)], "domain STRING, content STRING")
    star = {(r.like_pattern, r.allow) for r in
            parse_robots_rules(robots, agent="*").collect()}
    assert ("/admin/%", 0) in star and ("/admin/public/%", 1) in star
    assert ("/tmp%%", 0) in star                         # '*' → '%', + suffix
    assert ("/exact", 0) in star                         # '$' anchored
    assert all("/private/" not in p for p, _ in star)    # googlebot group
    goog = {(r.like_pattern, r.allow) for r in
            parse_robots_rules(robots, agent="googlebot").collect()}
    assert goog == {("/private/%", 0)}                   # exact shadows *


def test_robots_filter_longest_match_wins(spark):
    from enrich_spark.datapipe.webtext import (parse_robots_rules,
                                               robots_filter)

    robots = spark.createDataFrame(
        [("example.com", _ROBOTS)], "domain STRING, content STRING")
    rules = parse_robots_rules(robots, agent="*")
    urls = spark.createDataFrame(
        [(1, "https://example.com/admin/secret"),       # disallow
         (2, "https://example.com/admin/public/x"),     # allow (longer)
         (3, "https://example.com/tmpfile"),            # wildcard disallow
         (4, "https://example.com/exact"),              # $-anchored
         (5, "https://example.com/exactly"),            # past anchor → ok
         (6, "https://example.com/open/page"),          # no rule → ok
         (7, "https://other.org/admin/secret")],        # other domain → ok
        "id INT, url STRING")
    got = {r.id: (r.allowed, r.deciding_rule_len)
           for r in robots_filter(urls, rules).collect()}
    assert got[1] == (0, len("/admin/"))
    assert got[2] == (1, len("/admin/public/"))
    assert got[3] == (0, len("/tmp*"))
    assert got[4] == (0, len("/exact$"))
    assert got[5][0] == 1
    assert got[6] == (1, 0) and got[7] == (1, 0)


def test_robots_filter_is_broadcast_native(spark):
    from enrich_spark.datapipe.webtext import (parse_robots_rules,
                                               robots_filter)

    robots = spark.createDataFrame(
        [("example.com", _ROBOTS)], "domain STRING, content STRING")
    urls = spark.createDataFrame([(1, "https://example.com/a")],
                                 "id INT, url STRING")
    out = robots_filter(urls, parse_robots_rules(robots))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # exactly one Python stage: the robots-body parse, never the URLs
    assert plan.count("MapInPandas") == 1


def test_jpeg_12bit_extended_sequential():
    import numpy as np
    import pytest

    from enrich_spark.datapipe.jpeg import decode_jpeg, encode_jpeg

    # solid 12-bit gray: DC-only → exact through quantization
    flat = np.full((16, 24), 1234, dtype=np.uint16)
    w, h, ch, out = decode_jpeg(encode_jpeg(24, 16, flat, quality=100,
                                            precision=12))
    assert (w, h, ch) == (24, 16, 1) and out.dtype == np.uint16
    assert np.array_equal(out[:, :, 0], flat)

    # 12-bit RGB gradient: PSNR bound against the 4095 peak
    yy, xx = np.mgrid[0:21, 0:33]
    img = np.stack([(xx * 101) % 4096, (yy * 157) % 4096,
                    ((xx + yy) * 71) % 4096], axis=-1).astype(np.uint16)
    w, h, ch, out = decode_jpeg(encode_jpeg(33, 21, img, quality=95,
                                            precision=12))
    assert (w, h, ch) == (33, 21, 3) and out.dtype == np.uint16
    mse = np.mean((out.astype(float) - img.astype(float)) ** 2)
    assert 10 * np.log10(4095**2 / mse) > 25

    # the stream really is SOF1 (extended sequential)
    data = encode_jpeg(24, 16, flat, quality=90, precision=12)
    assert b"\xff\xc1" in data and b"\xff\xc0" not in data

    # loud boundaries: 12-bit progressive / CMYK fixtures rejected
    with pytest.raises(ValueError):
        encode_jpeg(8, 8, flat[:8, :8], precision=12, progressive=True)
    with pytest.raises(ValueError):
        encode_jpeg(8, 8, np.zeros((8, 8, 4), np.uint16), precision=12)


def test_mp4_metadata():
    """ISO-BMFF box walk (media_codecs.parse_mp4): mvhd v0/v1 duration,
    video-trak tkhd dims, stsd codec fourcc, track inventory; hostile
    bytes reject as ValueError and truncated moov yields partial
    metadata, never an exception."""
    import pytest

    from enrich_spark.datapipe.media_codecs import (encode_mp4_header,
                                                    parse_mp4)
    from enrich_spark.datapipe.multimodal import _decode_one

    for version in (0, 1):
        blob = encode_mp4_header(125000, 1920, 1080, "avc1", audio=True,
                                 mvhd_version=version)
        assert parse_mp4(blob) == (125000, 1920, 1080, 2, "avc1", "isom")
    dur, w, h, n, codec, brand = parse_mp4(
        encode_mp4_header(30000, 640, 360, "av01"))
    assert (dur, w, h, n, codec) == (30000, 640, 360, 1, "av01")
    with pytest.raises(ValueError):
        parse_mp4(b"not an mp4 at all")
    # truncated mid-moov: partial metadata, no exception
    blob = encode_mp4_header(9000, 320, 240)
    assert parse_mp4(blob[:40])[5] == "isom"

    # a truncated mvhd followed by a sibling box must NOT read the
    # sibling's bytes as timescale/duration (bound = mvhd's own end,
    # not the enclosing moov's)
    import struct as _s

    def _box(t, body):
        return _s.pack(">I", len(body) + 8) + t + body

    ftyp = _box(b"ftyp", b"isom" + _s.pack(">I", 0x200) + b"isomiso2")
    short_mvhd = _box(b"mvhd", bytes(4) + _s.pack(">II", 0, 0))  # 12 < 24
    sibling = _box(b"free", _s.pack(">IIII", 9999, 9999, 9999, 9999))
    assert parse_mp4(ftyp + _box(b"moov", short_mvhd + sibling))[0] is None

    row = _decode_one(encode_mp4_header(125000, 1920, 1080, "hev1"))
    assert (row["codec"], row["duration_ms"], row["width"],
            row["height"]) == ("mp4/hev1", 125000, 1920, 1080)
    assert row["mean_val"] is None  # metadata-only, honestly flagged


def test_attach_media_meta_mp4_routing(spark):
    """The native planner routes ftyp streams as video/mp4 with zero
    Python (box layouts vary, so dims stay NULL for the kernel)."""
    from enrich_spark.datapipe.media_codecs import encode_mp4_header
    from enrich_spark.datapipe.multimodal import attach_media_meta

    df = spark.createDataFrame(
        [(1, bytearray(encode_mp4_header(5000, 640, 480)))],
        "id INT, media BINARY")
    out = attach_media_meta(df).select("id", "media_meta.*")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    row = out.collect()[0]
    assert (row.format, row.media_type) == ("mp4", "video")


def test_jpeg_lossless_roundtrip():
    """SOF3 lossless (T.81 Annex H): every predictor 1-7 round-trips
    bit-exact in gray and 3-component at 8/12/16-bit; point transform
    reconstructs (px >> Pt) << Pt; restart intervals reset prediction;
    hostile bytes reject as ValueError."""
    import numpy as np
    import pytest

    from enrich_spark.datapipe.jpeg import (decode_jpeg,
                                            encode_jpeg_lossless)

    rng = np.random.default_rng(42)
    for pred in range(1, 8):
        px = rng.integers(0, 256, size=(9, 13), dtype=np.uint16)
        w, h, nc, out = decode_jpeg(
            encode_jpeg_lossless(13, 9, px, predictor=pred))
        assert (w, h, nc) == (13, 9, 1) and out.dtype == np.uint8
        assert (out[:, :, 0] == px).all()
    px = rng.integers(0, 1 << 16, size=(6, 7, 3), dtype=np.uint16)
    _, _, nc, out = decode_jpeg(
        encode_jpeg_lossless(7, 6, px, predictor=4, precision=16))
    assert nc == 3 and out.dtype == np.uint16 and (out == px).all()
    px = rng.integers(0, 4096, size=(11, 10), dtype=np.uint16)
    _, _, _, out = decode_jpeg(encode_jpeg_lossless(
        10, 11, px, predictor=6, precision=12, restart_interval=8))
    assert (out[:, :, 0] == px).all()
    px = rng.integers(0, 256, size=(5, 5), dtype=np.uint16)
    _, _, _, out = decode_jpeg(encode_jpeg_lossless(
        5, 5, px, predictor=2, point_transform=3))
    assert (out[:, :, 0] == (px >> 3) << 3).all()
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xc3\x00\x04\x08\x00")

    # hostile-bytes contract holds on the paths a blanket fuzz misses:
    # SOS naming a component the SOF3 never declared (was StopIteration),
    # truncated DRI, truncated SOS header (were struct.error/IndexError)
    good = encode_jpeg_lossless(
        5, 5, rng.integers(0, 256, size=(5, 5), dtype=np.uint16))
    sos_at = good.find(b"\xff\xda")
    assert sos_at > 0
    bad_comp = bytearray(good)
    bad_comp[sos_at + 5] = 0x99  # scan component id -> undeclared
    with pytest.raises(ValueError, match="unknown component"):
        decode_jpeg(bytes(bad_comp))
    head = good[:sos_at]
    with pytest.raises(ValueError):
        decode_jpeg(head + b"\xff\xdd\x00\x03\x00")  # DRI, 1-byte payload
    with pytest.raises(ValueError):
        decode_jpeg(head + b"\xff\xda\x00\x04\x02\x01")  # SOS cut short


def test_leakage_safe_split(spark):
    """Cluster-aware splitting: every near-dup cluster member lands in
    the SAME split; fractions roughly hold; deterministic across calls
    and independent of unrelated additions; DuckDB mirror agrees."""
    import duckdb

    from enrich_spark.datapipe.curation import (
        leakage_safe_split, leakage_safe_split_sql,
    )

    docs = spark.range(0, 400).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (50, 51)], "id_a LONG, id_b LONG")
    out = leakage_safe_split(docs, pairs).collect()
    by_id = {r.doc_id: r for r in out}
    assert len(out) == 400
    # chained cluster {0,1,2} — one split, one cluster id (the min)
    assert {by_id[i].cluster_id for i in (0, 1, 2)} == {0}
    assert len({by_id[i].split for i in (0, 1, 2)}) == 1
    assert len({by_id[i].split for i in (10, 11)}) == 1
    assert len({by_id[i].split for i in (50, 51)}) == 1
    # fractions ~0.9/0.05/0.05 over 400 docs
    from collections import Counter

    c = Counter(r.split for r in out)
    assert c["train"] > 300 and 0 < c["val"] < 60 and 0 < c["test"] < 60
    # determinism
    again = {r.doc_id: r.split for r in
             leakage_safe_split(docs, pairs).collect()}
    assert again == {r.doc_id: r.split for r in out}
    # unrelated additions don't move existing assignments
    bigger = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    wider = {r.doc_id: r.split for r in
             leakage_safe_split(bigger, pairs).collect()}
    assert all(wider[i] == by_id[i].split for i in range(400))

    # DuckDB mirror parity (cluster table fed explicitly)
    con = duckdb.connect()
    con.execute("CREATE TABLE docs AS SELECT range AS doc_id FROM range(400)")
    con.execute("CREATE TABLE clus (doc_id BIGINT, cluster_id BIGINT)")
    con.executemany("INSERT INTO clus VALUES (?, ?)",
                    [(0, 0), (1, 0), (2, 0), (10, 10), (11, 10),
                     (50, 50), (51, 50)])
    sql = leakage_safe_split_sql(
        "docs", "doc_id", "SELECT doc_id, cluster_id FROM clus")
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    got = sorted((r.doc_id, r.cluster_id, r.split) for r in out)
    assert got == want

    with pytest.raises(ValueError, match="sum to 1"):
        leakage_safe_split(docs, None, fractions={"train": 0.5})


def _fake_native_jpeg(data):
    """Picklable stand-in for a libjpeg-backed decoder: fixed 2x2 gray
    42s, so its output is distinguishable from the pure kernel's."""
    import numpy as np

    return 2, 2, 1, np.full((2, 2), 42, np.uint8)


def test_native_jpeg_decoder_seam(spark):
    """set_native_jpeg_decoder installs a native decoder behind the
    decode_features contract; the config ships to executors in the
    closure; the pure kernel stays the default (the hash-gated path)."""
    import numpy as np

    from enrich_spark.datapipe import multimodal
    from enrich_spark.datapipe.jpeg import encode_jpeg

    jpg = encode_jpeg(10, 6, np.full((6, 10, 3), 55, np.uint8), quality=90)
    df = spark.createDataFrame([(1, bytearray(jpg))], "id INT, media BINARY")

    def decode(**kw):
        return multimodal.decode_features(df, **kw).collect()[0]

    try:
        # default: pure kernel
        assert decode().mean_val == 55.0
        # installed: routed through the native callable (executor-side)
        multimodal.set_native_jpeg_decoder(_fake_native_jpeg)
        got = decode()
        assert (got.width, got.height, got.mean_val) == (2, 2, 42.0)
        # per-call opt-out beats the global
        assert decode(use_native=False).mean_val == 55.0
        # non-JPEG codecs never touch the seam
        from enrich_spark.datapipe import media_codecs as mc

        png = mc.encode_png(4, 3, np.full((3, 12), 7, np.uint8))
        pdf = spark.createDataFrame([(1, bytearray(png))],
                                    "id INT, media BINARY")
        assert multimodal.decode_features(pdf).collect()[0].mean_val == 7.0
    finally:
        multimodal.set_native_jpeg_decoder(None)
    # "auto" with no Pillow in this container → falls back to the pure
    # kernel (probe returns None executor-side)
    try:
        multimodal.set_native_jpeg_decoder("auto")
        assert decode().mean_val == 55.0
    finally:
        multimodal.set_native_jpeg_decoder(None)


def test_native_seam_real_alternative_decoder_e2e(spark):
    """r11: the seam runs a REAL alternative decoder end to end —
    decode_jpeg_fixedpoint (scaled-integer IDCT + fixed-point YCbCr,
    the libjpeg arithmetic family) through set_native_jpeg_decoder +
    decode_features' per-executor resolution in mapInPandas. The
    divergence contract holds: ±1 per sample on a single DCT plane
    (grayscale), ≤ ±6 on RGB (three ±1 planes compounded through the
    color matrix), and the outputs DO differ — proof the alternative
    numerics actually executed executor-side, not the pure kernel."""
    import numpy as np

    from enrich_spark.datapipe import multimodal
    from enrich_spark.datapipe.jpeg import (
        decode_jpeg, decode_jpeg_fixedpoint, encode_jpeg,
    )

    rng = np.random.default_rng(11)
    imgs = []
    for i in range(4):
        raw = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        img = (raw.astype(float) * 0.3 + 127 * 0.7).astype(np.uint8)
        imgs.append(encode_jpeg(64, 48, img, quality=80 + 4 * i))
    gray = (np.linspace(0, 255, 48 * 48).reshape(48, 48)
            .astype(np.uint8)[:, :, None])
    imgs.append(encode_jpeg(48, 48, gray, quality=85))

    # local divergence contract
    any_diff = False
    for k, jpg in enumerate(imgs):
        _, _, ch, p_float = decode_jpeg(jpg)
        _, _, _, p_fixed = decode_jpeg_fixedpoint(jpg)
        d = np.abs(p_float.astype(int) - p_fixed.astype(int))
        assert d.max() <= (1 if ch == 1 else 6), (k, d.max())
        any_diff = any_diff or d.max() > 0
    assert any_diff

    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(imgs)],
        "id LONG, media BINARY")
    try:
        multimodal.set_native_jpeg_decoder(decode_jpeg_fixedpoint)
        nat = {r.id: r for r in
               multimodal.decode_features(df, use_native=True).collect()}
    finally:
        multimodal.set_native_jpeg_decoder(None)
    pure = {r.id: r for r in
            multimodal.decode_features(df, use_native=False).collect()}
    assert set(nat) == set(pure) == set(range(len(imgs)))
    for i in nat:
        assert nat[i].codec == pure[i].codec == "jpeg"
        assert (nat[i].width, nat[i].height, nat[i].channels) == \
               (pure[i].width, pure[i].height, pure[i].channels)
        # means stay within the per-sample bound...
        assert abs(nat[i].mean_val - pure[i].mean_val) <= 6.0
    # ...and at least one image's mean differs: the alternative
    # numerics ran in the executor-side mapInPandas, not the kernel
    assert any(nat[i].mean_val != pure[i].mean_val for i in nat)


def test_incremental_dedup_pairs(spark):
    """New-batch-vs-stored-index near-dedup: only new docs pay
    signature compute; matches are found across (never within) the
    batch/corpus boundary; agreement semantics match the streaming
    kernel's integer bp estimate."""
    from enrich_spark.datapipe.dedup import (
        build_minhash_index, incremental_dedup_pairs,
    )

    base = ("the quick brown fox jumps over the lazy dog while the "
            "spark executor shuffles partitions and prunes columns")
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different content about pasta "
                        "dishes cooked at home on sunday")],
        "doc_id long, text string")
    index = build_minhash_index(corpus, num_hashes=16, bands=8,
                                shingle_k=3)
    # persistable: write + read back, the production index shape
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        index.write.parquet(f"{tmp}/idx")
        stored = spark.read.parquet(f"{tmp}/idx")
        new = spark.createDataFrame(
            [(10, base + " happily"),            # near-dup of corpus 1
             (11, "fresh unrelated text about gardening tools and "
                  "compost in the spring"),
             (12, base + " happily")],           # near-dup of 1 AND 10
            "doc_id long, text string")
        got = incremental_dedup_pairs(
            new, stored, num_hashes=16, bands=8, shingle_k=3,
            sim_threshold=0.6).collect()
    pairs = {(r.new_id, r.corpus_id) for r in got}
    # 10 and 12 match corpus doc 1; NOT each other (both are new-side;
    # an intra-batch check is minhash_lsh_pairs' job)
    assert pairs == {(10, 1), (12, 1)}
    assert all(6000 <= r.est_jaccard_bp <= 10000 for r in got)


def test_incremental_dedup_plan_contract(spark):
    """The candidate join is a banded equi-join on (band_id,
    band_hash) — never a cartesian/nested-loop explosion."""
    from enrich_spark.datapipe.dedup import (
        build_minhash_index, incremental_dedup_pairs,
    )

    docs = spark.range(32).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("words repeated across documents body text "),
                 (F.col("id") % 5).cast("string")).alias("text"))
    plan = incremental_dedup_pairs(
        docs.where("doc_id % 4 = 0"),
        build_minhash_index(docs.where("doc_id % 4 != 0")),
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_zorder_clustering_locality(spark):
    """zorder_by: one range shuffle on the Morton key; written out,
    each partition covers a small rectangle in BOTH dimensions — the
    per-partition span of each column must be far below the global
    span (that is the file-skipping property)."""
    from enrich_spark.datapipe.layout import zorder_by, zorder_key

    n = 4096
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % 65536).alias("x"),
        (F.col("id") * 40503 % 65536).alias("y"))
    out = zorder_by(df, ("x", "y"), num_partitions=16)
    spans = (out.withColumn("p", F.spark_partition_id())
             .groupBy("p")
             .agg((F.max("x") - F.min("x")).alias("sx"),
                  (F.max("y") - F.min("y")).alias("sy"))
             .agg(F.avg("sx").alias("ax"), F.avg("sy").alias("ay"))
             .collect()[0])
    # random layout would give ~65535 span per partition in both dims;
    # 16 z-ordered partitions ≈ 4x4 grid → ~1/4 span in each
    assert spans.ax < 65536 * 0.45 and spans.ay < 65536 * 0.45, spans
    # key math: interleave is exact (spot-check against pure Python)
    got = spark.range(1).select(
        zorder_key(F.lit(0b1011), F.lit(0b0110)).alias("z")).collect()[0].z

    def interleave(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == interleave(0b1011, 0b0110)
    assert out.count() == n                  # clustering loses nothing


def test_sample_exact_k(spark):
    """Exactly k rows, deterministic under repartitioning, uniform-ish;
    the plan is a distributed top-k, not a single-partition sort."""
    from enrich_spark.datapipe.layout import sample_exact_k

    df = spark.range(10_000).select(F.col("id").alias("doc_id"))
    a = sorted(r.doc_id for r in sample_exact_k(df, 100).collect())
    b = sorted(r.doc_id for r in
               sample_exact_k(df.repartition(17), 100).collect())
    assert len(a) == 100 and a == b          # deterministic, exact
    c = sorted(r.doc_id for r in sample_exact_k(df, 100, seed=7).collect())
    assert c != a                            # seed changes the draw
    assert len(sorted(r.doc_id for r in
                      sample_exact_k(df.limit(50), 100).collect())) == 50
    plan = sample_exact_k(df, 100)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_hll_distinct_portable(spark):
    """Portable HLL: bit-identical to its DuckDB mirror (the gate
    property) and within the ~1.04/sqrt(m) error envelope of the exact
    distinct count per group."""
    import duckdb
    import pandas as pd

    from enrich_spark.datapipe.sketches import (
        hll_distinct_portable, hll_distinct_portable_sql,
    )

    rows = [(i, f"val-{i % 700}", f"s{i % 2}") for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, v string, src string")
    got = sorted(tuple(r) for r in
                 hll_distinct_portable(df, "v", ("src",), p=10).collect())
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["id", "v", "src"]))
    want = sorted(tuple(r) for r in con.execute(
        hll_distinct_portable_sql("t", "v", ("src",), p=10)).fetchall())
    assert got == want                      # engine-exact replay
    # exact distinct per src group is 350 (gcd(2,700)=2); p=10 →
    # relative error ~3.3%, allow 4 sigma
    for _, _, est in got:
        assert abs(est - 350) / 350 < 0.13, est
    # ungrouped + high-cardinality regime (raw harmonic-mean branch)
    big = spark.range(50_000).select(
        F.col("id").cast("string").alias("v"))
    est = hll_distinct_portable(big, "v", p=10).collect()[0].est_distinct
    assert abs(est - 50_000) / 50_000 < 0.15, est


def test_sample_exact_k_per_group(spark):
    from enrich_spark.datapipe.layout import sample_exact_k_per_group

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("source"))
    out = sample_exact_k_per_group(df, 10, "source")
    got = out.groupBy("source").count().collect()
    # groups 0..6 have 143±1 members each → every group capped at 10
    assert {r["count"] for r in got} == {10} and len(got) == 7
    # deterministic under repartitioning
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in sample_exact_k_per_group(
        df.repartition(13), 10, "source").collect())
    assert a == b
    # a group smaller than k keeps all its rows
    tiny = sample_exact_k_per_group(df.where("doc_id < 3"), 10, "source")
    assert tiny.count() == 3


def test_fit_ridge_one_pass(spark):
    """Normal-equation ridge fit: matches numpy least squares, is
    bit-identical to the DuckDB mirror (Cramer expression parity), is
    deterministic under repartitioning, and l2 shrinks coefficients."""
    import duckdb
    import numpy as np
    import pandas as pd

    from enrich_spark.datapipe.regress import (
        fit_ridge_2f, fit_ridge_2f_df, fit_ridge_2f_sql,
    )

    rng = np.random.default_rng(1)
    n = 2000
    x1 = rng.integers(1, 500, n)
    x2 = rng.integers(1, 80, n)
    y = (3 * x1 + 7 * x2 + 11 + rng.integers(-5, 6, n)).astype(int)
    rows = [(int(a), int(b), int(c)) for a, b, c in zip(x1, x2, y)]
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")

    got = fit_ridge_2f_df(df, "x1", "x2", "y").collect()[0]
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["x1", "x2", "y"]))
    want = con.execute(fit_ridge_2f_sql("t", "x1", "x2", "y")).fetchone()
    assert tuple(got) == want               # engine-exact replay

    beta = np.linalg.lstsq(
        np.column_stack([np.ones(n), x1, x2]), y, rcond=None)[0]
    assert abs(got.b0 - beta[0]) < 1e-4
    assert abs(got.b1 - beta[1]) < 1e-6 and abs(got.b2 - beta[2]) < 1e-6

    again = fit_ridge_2f_df(df.repartition(17), "x1", "x2", "y").collect()[0]
    assert tuple(got) == tuple(again)       # integer sums → no drift

    lam = fit_ridge_2f(df, "x1", "x2", "y", l2=10_000_000)
    assert abs(lam["b1"]) < abs(got.b1) and abs(lam["b2"]) < abs(got.b2)


def test_quantize_int8(spark):
    """Symmetric int8 quantization: codes bounded by ±127, max
    reconstruction error ≤ scale/2, and the whole op is a zero-shuffle
    map plan."""
    from enrich_spark.datapipe.similarity import quantize_int8

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = quantize_int8(emb)
    rows = out.collect()
    assert len(rows) == emb.count()
    for r in rows[:50]:
        assert max(abs(x) for x in r.q) <= 127
        assert r.max_abs_err_1e6 <= r.scale_1e9 // 2000 + 1  # ≤ s/2
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_mine_margin_pairs(spark):
    """Margin mining: a planted translation pair (near-identical
    vectors) survives; a hub vector (near everything) is suppressed by
    the neighborhood normalization even though its raw cosine is high."""
    import numpy as np

    from enrich_spark.datapipe.similarity import mine_margin_pairs

    rng = np.random.default_rng(3)
    dim = 16

    def unit(v):
        v = np.asarray(v, dtype=np.float32)
        return (v / np.linalg.norm(v)).tolist()

    base = rng.normal(size=(6, dim))
    src_rows = [(i, unit(base[i])) for i in range(6)]
    # tgt 100+i = noisy copy of src i (true pairs); tgt 200 = the hub:
    # the normalized MEAN of all src vectors — fairly close to every
    # src vector but no one's clear best partner
    tgt_rows = [(100 + i, unit(base[i] + rng.normal(scale=0.05, size=dim)))
                for i in range(6)]
    tgt_rows.append((200, unit(base.mean(axis=0))))
    src = spark.createDataFrame(src_rows, "vec_id long, embedding array<float>")
    tgt = spark.createDataFrame(tgt_rows, "vec_id long, embedding array<float>")

    got = mine_margin_pairs(src, tgt, k=3,
                            margin_threshold_ppm=1_100_000).collect()
    pairs = {(r.x, r.y) for r in got}
    assert pairs == {(i, 100 + i) for i in range(6)}, pairs
    assert all(r.margin_ppm > 1_100_000 for r in got)
    assert all(r.cos_u > 900_000 for r in got)   # the copies are close


def test_remove_boilerplate_lines(spark):
    """A line repeated in >max_doc_freq distinct docs is cut from every
    doc; short lines are exempt even when corpus-frequent; order and
    accounting survive; an all-boilerplate doc keeps clean_text = ''."""
    footer = "subscribe to our newsletter for updates"
    rows = [
        (1, f"alpha unique content one\n{footer}\nmore alpha text here"),
        (2, f"{footer}\nbeta body line that is unique"),
        (3, f"gamma opening line stands alone\n{footer}"),
        (4, footer),                       # nothing but boilerplate
        (5, "---\ndelta content\n---"),    # '---' short-line exempt
        (6, "---\nepsilon content\n---"),
        (7, "---\nzeta content\n---"),
    ]
    docs = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {r.doc_id: r for r in
           dedup.remove_boilerplate_lines(docs, max_doc_freq=2).collect()}
    assert out[1].clean_text == "alpha unique content one\nmore alpha text here"
    assert (out[1].n_lines, out[1].kept_lines, out[1].removed_lines) == (3, 2, 1)
    assert out[2].clean_text == "beta body line that is unique"
    assert out[3].clean_text == "gamma opening line stands alone"
    assert out[4].clean_text == "" and out[4].removed_lines == 1
    # '---' appears in 3 docs (> max_doc_freq) but is under
    # min_line_chars, so it survives everywhere
    assert out[5].clean_text == "---\ndelta content\n---"
    assert out[5].removed_lines == 0


def test_remove_boilerplate_lines_case_insensitive_freq(spark):
    """Frequency counting is over the NORMALIZED line (lower+trim), so
    casing/padding variants of the same chrome line pool together."""
    rows = [
        (1, "body one\nAll Rights Reserved"),
        (2, "body two\n  all rights reserved  "),
        (3, "body three\nALL RIGHTS RESERVED"),
    ]
    docs = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {r.doc_id: r for r in
           dedup.remove_boilerplate_lines(docs, max_doc_freq=2).collect()}
    assert out[1].clean_text == "body one"
    assert out[2].clean_text == "body two"
    assert out[3].clean_text == "body three"


def test_weighted_sample_k(spark):
    """Exactly k rows; deterministic under reruns; weights bias
    selection (a weight-64 block is overwhelmingly more likely in than
    a weight-1 block of the same size); weight<=0 clamps to 1 without
    error; k > n returns all rows."""
    from enrich_spark.datapipe.layout import weighted_sample_k

    rows = [(i, 64 if i < 200 else 1) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id LONG, w LONG")
    got = weighted_sample_k(df, 100, "w")
    ids1 = sorted(r.doc_id for r in got.collect())
    ids2 = sorted(r.doc_id for r in weighted_sample_k(df, 100, "w").collect())
    assert ids1 == ids2 and len(ids1) == 100
    heavy = sum(1 for i in ids1 if i < 200)
    # E[heavy] ≈ 100·(64·200)/(64·200+200) ≈ 98.5; even 5σ below stays >90
    assert heavy > 90, heavy

    clamped = weighted_sample_k(
        spark.createDataFrame([(1, -5), (2, 0), (3, 2)],
                              "doc_id LONG, w LONG"), 10, "w").collect()
    assert sorted(r.doc_id for r in clamped) == [1, 2, 3]


def test_weighted_sample_k_plan_is_distributed_topk(spark):
    """The selection must compile to TakeOrderedAndProject (per-partition
    top-k + k-row merge), never a global single-partition sort."""
    from enrich_spark.datapipe.layout import weighted_sample_k

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (1 + F.col("id") % 7).alias("w"))
    plan = weighted_sample_k(df, 10, "w")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_normalize_text(spark):
    """Each rule fires: CRLF/CR -> LF, C0 control strip, mojibake
    repair (derived cp1252 table), space/tab collapse, trailing-space
    strip, blank-run collapse, outer trim; clean text is unchanged."""
    from enrich_spark.datapipe.text import _MOJIBAKE, normalize_text

    moji = {g: b for b, g in _MOJIBAKE}
    rows = [
        (1, "a\r\nb\rc"),
        (2, "x\x00y\x1fz\x7f."),
        (3, f"it{moji['’']}s {moji['“']}fine{moji['é']}"),
        (4, "w  o\t\tr   d  \nnext"),
        (5, "top\n\n\n\n\nbottom"),
        (6, "  already clean text\nsecond line  "),
        (7, "untouched middle"),
    ]
    docs = spark.createDataFrame(rows, "doc_id INT, text STRING")
    got = {r.doc_id: r for r in normalize_text(docs).collect()}
    assert got[1].text_norm == "a\nb\nc"
    assert got[2].text_norm == "xyz."
    assert got[3].text_norm == "it’s “fineé"
    assert got[4].text_norm == "w o r d\nnext"
    assert got[5].text_norm == "top\n\nbottom"
    assert got[6].text_norm == "already clean text\nsecond line"
    assert got[7].text_norm == "untouched middle"
    assert got[7].norm_changed == 0 and got[7].norm_delta_chars == 0
    assert got[1].norm_changed == 1


def test_quantile_bins(spark):
    """Bins are 1..k, value-keyed (equal scores share a bin),
    monotone in the score, sizes near-equal without ties, and the
    cardinality guard fires."""
    import pytest as _pytest

    from enrich_spark.datapipe.curation import quantile_bins

    docs = spark.createDataFrame(
        [(i, i % 100) for i in range(400)], "doc_id LONG, score LONG")
    out = quantile_bins(docs, "score", k=4).collect()
    by_score = {}
    for r in out:
        by_score.setdefault(r.score, set()).add(r.bin)
    assert all(len(b) == 1 for b in by_score.values())   # value-keyed
    ordered = [next(iter(by_score[s])) for s in sorted(by_score)]
    assert ordered == sorted(ordered) and set(ordered) == {1, 2, 3, 4}
    from collections import Counter
    sizes = Counter(r.bin for r in out)
    assert max(sizes.values()) - min(sizes.values()) <= 4

    with _pytest.raises(ValueError, match="distinct scores"):
        quantile_bins(docs, "score", k=4, max_distinct=10)


def test_negative_samples(spark):
    """Exactly <=k negatives per anchor, never the anchor itself,
    deterministic across calls, all negatives are real corpus ids, and
    the generator's driver state is bounded by n_buckets."""
    from enrich_spark.datapipe.similarity import negative_samples

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id LONG, text STRING")
    out = negative_samples(docs, k=3, n_buckets=32).collect()
    ids = set(range(200))
    per_anchor = {}
    for r in out:
        assert r.neg_id in ids and r.neg_id != r.anchor_id
        per_anchor.setdefault(r.anchor_id, []).append((r.j, r.neg_id))
    assert set(per_anchor) <= ids
    assert all(len(v) <= 3 for v in per_anchor.values())
    # the overwhelming majority of anchors get the full k (self-hits
    # only when an anchor IS a probed bucket's representative)
    assert sum(1 for v in per_anchor.values() if len(v) == 3) > 150
    again = negative_samples(docs, k=3, n_buckets=32).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_negative_samples_plan_is_map_side(spark):
    """After the bounded rep collect, the sampling pass itself must be
    map-side: no join, no shuffle exchange in the plan."""
    from enrich_spark.datapipe.similarity import negative_samples

    docs = spark.range(100).select(F.col("id").alias("doc_id"))
    plan = negative_samples(docs, k=2, n_buckets=16)._jdf \
        .queryExecution().executedPlan().toString()
    for op in ("Exchange", "SortMergeJoin", "BroadcastHashJoin",
               "CartesianProduct"):
        assert op not in plan, plan


def test_resize_images(spark):
    """Real nearest-neighbor resample through the mapInPandas op:
    gradient image resamples to the exact floor-mapped pixels (digest
    checked against a manual numpy resample), constant image stays
    constant, non-raster bytes become codec='skip' rows."""
    import hashlib

    import numpy as np

    from enrich_spark.datapipe.media_codecs import decode_bmp, encode_bmp, encode_png
    from enrich_spark.datapipe.multimodal import resize_images

    grad = (np.arange(6 * 4 * 3) % 256).astype(np.uint8).reshape(4, 18)
    rows = [
        (1, bytearray(encode_png(7, 3, np.full((3, 21), 99, np.uint8)))),
        (2, bytearray(encode_bmp(6, 4, grad))),
        (3, bytearray(b"RIFF0000WAVEnot-an-image")),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, media BINARY")
    got = {r.doc_id: r for r in
           resize_images(df, width=3, height=2).collect()}
    assert (got[1].src_width, got[1].src_height) == (7, 3)
    assert (got[1].width, got[1].height, got[1].channels) == (3, 2, 3)
    assert got[1].mean_val == 99.0 and got[1].codec == "png"

    _, _, _, px = decode_bmp(bytes(rows[1][1]))
    a = px.reshape(4, 6, 3)
    manual = a[(np.arange(2) * 4) // 2][:, (np.arange(3) * 6) // 3]
    assert got[2].pixel_digest == hashlib.md5(manual.tobytes()).hexdigest()
    assert got[2].mean_val == manual.mean()

    assert got[3].codec == "skip" and got[3].width is None


def test_select_token_budget(spark):
    """The radix threshold search selects EXACTLY the prefix of the
    (score desc, hash, id) order whose inclusive token cumsum fits the
    budget — checked against a brute-force replay; multi-round
    refinement (tiny cell_cap) and the all-fits short-circuit both
    hold; higher scores are never displaced by lower ones."""
    import hashlib

    from enrich_spark.datapipe.curation import select_token_budget

    rows = [(i, i % 5, 10 + i % 37) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id LONG, score LONG, n_tokens LONG")

    def key(i, s):
        return (format((1 << 31) - 1 - s, "08x")
                + hashlib.md5(f"42:{i}".encode()).hexdigest()
                + format(i, "016x"))

    ordered = sorted(rows, key=lambda r: key(r[0], r[1]))
    budget, cum, want = 2500, 0, set()
    for i, s, t in ordered:
        if cum + t > budget:
            break
        cum += t
        want.add(i)

    got = {r.doc_id for r in
           select_token_budget(docs, budget, "score", cell_cap=4).collect()}
    assert got == want
    sel_scores = {s for i, s, _ in rows if i in got}
    unsel_scores = {s for i, s, _ in rows if i not in got}
    assert min(sel_scores) >= max(unsel_scores) - 1  # boundary is one score

    assert select_token_budget(docs, 10**9, "score").count() == 300


def test_select_token_budget_validates_preconditions(spark):
    """NULL score/id/token and out-of-range scores raise in the initial
    pass instead of silently mis-selecting (NULL keys vanish from
    filters; scores >= 2^31 overflow the 8-hex key prefix)."""
    import pytest as _pytest

    from enrich_spark.datapipe.curation import select_token_budget

    nulls = spark.createDataFrame(
        [(1, 5, 10), (2, None, 10)],
        "doc_id LONG, score LONG, n_tokens LONG")
    with _pytest.raises(ValueError, match="NULL"):
        select_token_budget(nulls, 5, "score")

    big = spark.createDataFrame(
        [(1, 5, 10), (2, 1 << 31, 10)],
        "doc_id LONG, score LONG, n_tokens LONG")
    with _pytest.raises(ValueError, match="2\\^31"):
        select_token_budget(big, 5, "score")

    neg = spark.createDataFrame(
        [(1, -3, 10)], "doc_id LONG, score LONG, n_tokens LONG")
    with _pytest.raises(ValueError, match="2\\^31"):
        select_token_budget(neg, 5, "score")


def test_select_token_budget_radix_rounds_read_cache(spark):
    """The r11 persist: a multi-round radix search scans the SOURCE at
    most twice (one cache fill during the validation pass + one
    recompute at the caller's action) — not once per round. Counted via
    an accumulator UDF on the token column: pre-persist the same search
    cost >= 5 source scans (validate + 2 radix rounds + straddle fetch
    + final action)."""
    from pyspark.sql import functions as F

    from enrich_spark.datapipe.curation import select_token_budget

    acc = spark.sparkContext.accumulator(0)

    def _count(v):
        acc.add(1)
        return v

    cudf = F.udf(_count, "long")
    n = 2000
    docs = (spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 100).alias("score"),
        F.lit(10).cast("long").alias("n_tokens"))
        .withColumn("n_tokens", cudf("n_tokens")))
    # cell_cap=2 forces >= 2 radix rounds before the straddle fetch
    out = select_token_budget(docs, n * 10 // 3, "score", cell_cap=2)
    assert 0 < out.count() < n
    assert acc.value <= 2 * n + n // 5, (
        f"{acc.value} token-column evaluations for {n} rows — the radix "
        "rounds are re-scanning the source instead of the cache")


def test_quantile_bins_guard_bounds_driver_fetch(spark):
    """The max_distinct guard fires from a LIMITed fetch — the plan
    collects at most max_distinct+1 rows, never the full distinct-score
    table (the ADVICE r10 driver-OOM hole)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from enrich_spark.datapipe.curation import quantile_bins

    acc = spark.sparkContext.accumulator(0)

    def _count(v):
        acc.add(1)
        return v

    cudf = F.udf(_count, "long")
    docs = spark.range(5000).select(
        F.col("id").alias("doc_id"), cudf(F.col("id")).alias("score"))
    with _pytest.raises(ValueError, match="max_distinct"):
        quantile_bins(docs, "score", k=4, max_distinct=10)


def test_mine_margin_pairs_src_cap(spark):
    """The broadcast contract is enforced: src larger than max_src_rows
    raises (pointing at lsh_topk) instead of building the OOM-risk
    broadcast plan; None skips the count."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from enrich_spark.datapipe.similarity import mine_margin_pairs

    vecs = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.col("id").cast("double"),
                F.lit(1.0), F.lit(2.0)).alias("embedding"))
    with _pytest.raises(ValueError, match="lsh_topk"):
        mine_margin_pairs(vecs, vecs, k=2, max_src_rows=10)
    # cap disabled -> runs (result content covered by test_mine_margin_pairs)
    assert mine_margin_pairs(
        vecs.limit(3), vecs, k=2, max_src_rows=None).count() >= 0


def test_negative_samples_empty_corpus(spark):
    """An empty corpus returns an empty (anchor_id, j, neg_id) frame
    with the populated-path schema instead of failing analysis on an
    argless create_map()."""
    from enrich_spark.datapipe.similarity import negative_samples

    docs = spark.createDataFrame([], "doc_id LONG, text STRING")
    out = negative_samples(docs, k=3, n_buckets=16)
    assert out.columns == ["anchor_id", "j", "neg_id"]
    assert out.count() == 0


def test_quantile_bins_grouped(spark):
    """Per-group bins: each group gets its own 1..k scale (a score that
    is top-tier in a weak group must NOT inherit a strong group's bin),
    value-keyed within the group, and the (group, score) cardinality
    guard fires from a LIMITed fetch."""
    import pytest as _pytest

    from enrich_spark.datapipe.curation import quantile_bins_grouped

    rows = ([(i, "lo", i % 10) for i in range(100)]
            + [(1000 + i, "hi", 100 + i % 10) for i in range(100)])
    docs = spark.createDataFrame(
        rows, "doc_id LONG, source STRING, score LONG")
    out = quantile_bins_grouped(docs, "score", "source", k=2).collect()
    by = {(r.source, r.score): r.bin for r in out}
    # per-group scales: score 9 is top of 'lo' -> bin 2; score 100 is
    # bottom of 'hi' -> bin 1, despite being globally larger
    assert by[("lo", 9)] == 2 and by[("lo", 0)] == 1
    assert by[("hi", 100)] == 1 and by[("hi", 109)] == 2
    # value-keyed within group
    assert len({(r.source, r.score, r.bin) for r in out}) == 20
    with _pytest.raises(ValueError, match="max_distinct"):
        quantile_bins_grouped(docs, "score", "source", k=2,
                              max_distinct=5)


def test_domain_cap(spark):
    """Per-domain frequency cap: <= cap rows per domain, higher scores
    win, ties break by the seeded hash then id (deterministic across
    calls), small domains pass through untouched, and the plan's window
    is PARTITIONED (never a global order)."""
    import hashlib

    from enrich_spark.datapipe.curation import domain_cap

    rows = [(i, f"dom{i % 3}", (i * 7) % 5) for i in range(90)]
    docs = spark.createDataFrame(
        rows, "doc_id LONG, source STRING, score LONG")
    out = domain_cap(docs, cap=10, domain_col="source",
                     score_col="score").collect()
    by_dom: dict = {}
    for r in out:
        by_dom.setdefault(r.source, []).append(r)
    assert set(by_dom) == {"dom0", "dom1", "dom2"}
    for dom, kept in by_dom.items():
        assert len(kept) == 10
        assert sorted(r.domain_rank for r in kept) == list(range(1, 11))
        # brute-force replay of the keep order
        cand = [(s, hashlib.md5(f"42:{i}".encode()).hexdigest(), i)
                for i, d, s in rows if d == dom]
        cand.sort(key=lambda t: (-t[0], t[1], t[2]))
        assert sorted(r.doc_id for r in kept) == \
            sorted(i for _, _, i in cand[:10])

    # unscored mode + pass-through when the domain is under the cap
    small = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id LONG, source STRING")
    got = domain_cap(small, cap=5, domain_col="source").collect()
    assert len(got) == 3

    # determinism across calls
    again = domain_cap(docs, cap=10, domain_col="source",
                       score_col="score").collect()
    assert sorted((r.doc_id, r.domain_rank) for r in again) == \
        sorted((r.doc_id, r.domain_rank) for r in out)

    # the salted production path and the plain single-window path
    # (salt_factor=1, the oracle's shape) keep IDENTICAL rows + ranks
    plain = domain_cap(docs, cap=10, domain_col="source",
                       score_col="score", salt_factor=1).collect()
    assert sorted((r.doc_id, r.domain_rank) for r in plain) == \
        sorted((r.doc_id, r.domain_rank) for r in out)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="cap"):
        domain_cap(docs, cap=0)
    with _pytest.raises(ValueError, match="salt_factor"):
        domain_cap(docs, cap=1, salt_factor=0)


def test_domain_cap_plan_salts_the_hot_domain_window(spark):
    """Plan contract (r12): NO Window over the raw domain key touches
    the full input — the full-input window is salted (domain,
    _dcap_salt), and the domain-only re-rank window sits above the
    partial-rank filter, so its partitions are <= salt_factor * cap
    rows by construction (a mega-domain can't become one task's sort:
    AQE cannot split window partitions)."""
    import re

    from enrich_spark.datapipe.curation import domain_cap

    docs = spark.createDataFrame(
        [(i, f"dom{i % 3}", (i * 7) % 5) for i in range(90)],
        "doc_id LONG, source STRING, score LONG")
    plan = domain_cap(docs, cap=10, domain_col="source",
                      score_col="score")._jdf.queryExecution() \
        .executedPlan().toString()
    specs = list(re.finditer(r"windowspecdefinition\(source[^)]*", plan))
    assert len(specs) == 2, plan
    top, deep = specs          # executedPlan prints top-down
    assert "_dcap_salt" not in top.group(0)   # re-rank: domain only
    assert "_dcap_salt" in deep.group(0)      # full input: salted
    # the survivors filter separates the two windows in the tree
    assert "_dcap_prank" in plan[top.end():deep.start()], plan


def test_repartition_for_bytes(spark):
    """Partition count = ceil(total payload / target); explicit size
    expression honored; numeric-only frames fall back to a flat row
    estimate and never crash."""
    from enrich_spark.datapipe.layout import repartition_for_bytes

    docs = spark.createDataFrame(
        [(i, "x" * 1000) for i in range(100)], "doc_id LONG, text STRING")
    out = repartition_for_bytes(docs, 20_000)        # 100k bytes total
    assert out.rdd.getNumPartitions() == 5
    assert out.count() == 100

    out2 = repartition_for_bytes(docs, 10**9)
    assert out2.rdd.getNumPartitions() == 1

    explicit = repartition_for_bytes(
        docs, 25_000, F.length("text") * 2)          # 200k weighted
    assert explicit.rdd.getNumPartitions() == 8

    nums = spark.range(10).select(F.col("id").alias("doc_id"))
    assert repartition_for_bytes(nums, 320).rdd.getNumPartitions() == 2


def test_image_dhash_and_hamming_pairs(spark):
    """dHash kernel: identical images hash identically, a one-pixel
    perturbation moves Hamming by <= 2, different gradients are far;
    hamming_pairs over the hash column finds exactly the brute-force
    Hamming-<=k pair set; non-raster bytes yield codec='skip' with a
    NULL hash. Manual bit replay pins the packing convention (i=r*8+c,
    signed two's complement int64)."""
    import numpy as np

    from enrich_spark.datapipe.dedup import hamming_pairs
    from enrich_spark.datapipe.multimodal import dhash_one, image_dhash
    from enrich_spark.datapipe.media_codecs import encode_bmp

    def gradient(p, perturb=None):
        px = np.zeros((8, 9 * 3), np.uint8)
        for y in range(8):
            for x in range(9):
                v = (p * 17 + x * 29 + y * 5) % 251
                if perturb == (x, y):
                    v = (v + 40) % 251
                px[y, 3 * x:3 * x + 3] = v
        return encode_bmp(9, 8, px)

    rows = [
        (1, bytearray(gradient(100))),
        (2, bytearray(gradient(100))),          # exact dup of 1
        (3, bytearray(gradient(100, perturb=(4, 2)))),  # near dup
        (4, bytearray(gradient(171))),          # far gradient
        (5, bytearray(b"RIFF0000WAVEnot-an-image")),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, media BINARY")
    got = {r.doc_id: r for r in image_dhash(df).collect()}
    assert got[1].dhash == got[2].dhash
    assert got[1].codec == "bmp"
    assert got[5].codec == "skip" and got[5].dhash is None

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert 0 < ham(got[1].dhash, got[3].dhash) <= 2
    assert ham(got[1].dhash, got[4].dhash) > 8

    # packing convention replay: bit i = r*8+c set iff px[r][c+1] > px[r][c]
    want = 0
    for r in range(8):
        for c in range(8):
            l = (100 * 17 + c * 29 + r * 5) % 251
            rr = (100 * 17 + (c + 1) * 29 + r * 5) % 251
            if rr > l:
                want |= 1 << (r * 8 + c)
    if want >= 1 << 63:
        want -= 1 << 64
    assert got[1].dhash == want
    # kernel-level parity with the op
    assert dhash_one(bytes(rows[0][1]))["dhash"] == want

    hashes = image_dhash(df).where(F.col("dhash").isNotNull())
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in hamming_pairs(hashes, hash_col="dhash",
                                    max_hamming=4).collect()}
    vals = {d: got[d].dhash for d in (1, 2, 3, 4)}
    want_pairs = {(a, b): ham(vals[a], vals[b])
                  for a in vals for b in vals if a < b
                  and ham(vals[a], vals[b]) <= 4}
    assert pairs == want_pairs
    assert (1, 2) in pairs and pairs[(1, 2)] == 0


def test_hamming_pairs_matches_simhash_pairs(spark):
    """The factored-out generic band join reproduces simhash_pairs
    exactly when fed the same simhash column (same bands)."""
    from enrich_spark.datapipe.dedup import (
        hamming_pairs, simhash64, simhash_pairs,
    )

    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dogs"),
        (3, "the quick brown fox leaps over the lazy dog"),
        (4, "completely different content about spark engines"),
        (5, "spark engines process completely different content"),
        (6, "the quick brown fox jumps over the lazy dog"),  # dup of 1
    ]
    docs = spark.createDataFrame(texts, "doc_id LONG, text STRING")
    want = sorted(tuple(r) for r in simhash_pairs(
        docs, max_hamming=16, bands=4).collect())
    hashes = docs.select("doc_id",
                         simhash64(F.col("text")).alias("h"))
    got = sorted(tuple(r) for r in hamming_pairs(
        hashes, hash_col="h", max_hamming=16, bands=4).collect())
    assert got == want and len(got) > 0


def test_audio_fingerprint_and_pairs(spark):
    """Haitsma-Kalker fingerprint: identical audio hashes identically,
    re-encoding at a different amplitude SCALE keeps the hash (sign
    bits are scale-invariant), different band patterns are far, and
    hamming_pairs finds the brute-force pair set; non-audio bytes give
    afp_error rows with a NULL hash."""
    import math

    import numpy as np

    from enrich_spark.datapipe.dedup import hamming_pairs
    from enrich_spark.datapipe.media_codecs import encode_wav
    from enrich_spark.datapipe.multimodal import (
        audio_fingerprint, audio_fingerprint_row,
    )

    L, NF, NB = 360, 9, 9
    s = np.arange(L)

    def wav(pattern, scale=1.0):
        # pattern[t][b] in {0,1} -> LO/HI tone per band per frame; the
        # +30000*t*b energy ramp (the gated fixture's tie-break) makes
        # zero beta-combination bits firm negatives instead of
        # quantization-noise coin flips — without it, sign bits at
        # exactly-tied energies are NOT scale-invariant
        x = np.zeros(L * NF)
        for t in range(NF):
            fr = np.zeros(L)
            for b in range(NB):
                a2 = (2000.0 ** 2 if pattern[t][b] else 600.0 ** 2)
                amp = scale * math.sqrt(a2 + 30000.0 * t * b)
                fr += amp * np.sin(2 * np.pi * (20 * b + 11) * s / L)
            x[t * L:(t + 1) * L] = fr
        return encode_wav(8000, np.round(x).astype("<i2"))

    rng = np.random.default_rng(7)
    pat1 = (rng.random((NF, NB)) < 0.4).astype(int).tolist()
    pat2 = [row[:] for row in pat1]
    pat2[4][3] ^= 1                       # one cell flipped: <= 4 bits
    pat3 = (rng.random((NF, NB)) < 0.4).astype(int).tolist()

    rows = [
        (1, bytearray(wav(pat1))),
        (2, bytearray(wav(pat1))),            # exact dup
        (3, bytearray(wav(pat1, scale=0.5))),  # half volume, same signs
        (4, bytearray(wav(pat2))),            # near dup
        (5, bytearray(wav(pat3))),            # unrelated
        (6, bytearray(b"BM not a wav")),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, media BINARY")
    got = {r.doc_id: r for r in audio_fingerprint(df).collect()}
    assert got[1].afp == got[2].afp == got[3].afp
    assert got[6].afp is None and got[6].afp_error is not None

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert 0 < ham(got[1].afp, got[4].afp) <= 4
    assert ham(got[1].afp, got[5].afp) > 8
    # kernel == op
    assert audio_fingerprint_row(bytes(rows[0][1]))["afp"] == got[1].afp

    hashes = audio_fingerprint(df).where(F.col("afp").isNotNull())
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in hamming_pairs(hashes, hash_col="afp",
                                    max_hamming=4).collect()}
    vals = {d: got[d].afp for d in (1, 2, 3, 4, 5)}
    want = {(a, b): ham(vals[a], vals[b])
            for a in vals for b in vals
            if a < b and ham(vals[a], vals[b]) <= 4}
    assert pairs == want
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0


def test_write_shards_roundtrip(spark, tmp_path):
    """Sharded export: exactly n part-files, md5 shard membership is a
    pure function of (id, seed) the reader can recompute, re-reading
    the written files reproduces the input manifest bit-exactly, and
    intra-shard order is the stable (shard, id) sort."""
    import hashlib

    from enrich_spark.datapipe.layout import (
        shard_assign, shard_manifest, write_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"text body {i}") for i in range(500)],
        "doc_id LONG, text STRING")
    path = f"{tmp_path}/shards"
    manifest = write_shards(docs, path, n_shards=8)
    rows = {r.shard_id: r for r in manifest.collect()}
    assert set(rows) == set(range(8))
    assert sum(r.n_rows for r in rows.values()) == 500

    import glob
    dirs = glob.glob(f"{path}/shard_id=*")
    assert len(dirs) == 8
    parts = glob.glob(f"{path}/shard_id=*/part-*.parquet")
    assert len(parts) == 8                # exactly ONE file per shard

    back = spark.read.parquet(path)
    assert back.count() == 500
    # membership replay: shard_id == md5('0:'||id) 60-bit mod 8
    for r in back.limit(50).collect():
        want = int(hashlib.md5(f"0:{r.doc_id}".encode())
                   .hexdigest()[:15], 16) % 8
        assert r.shard_id == want
    # re-reading reproduces the manifest (content equality proof)
    again = {r.shard_id: r for r in shard_manifest(
        back, cols=["doc_id", "text"]).collect()}
    for sid, r in rows.items():
        assert (again[sid].n_rows, again[sid].content_xor,
                again[sid].bytes_total) == \
            (r.n_rows, r.content_xor, r.bytes_total)
    # each shard's single file is sorted by id
    import pandas as pd
    for pf in parts:
        pdf = pd.read_parquet(pf)
        assert list(pdf["doc_id"]) == sorted(pdf["doc_id"])

    import pytest as _pytest
    with _pytest.raises(ValueError, match="n_shards"):
        shard_assign(docs, 0)


def test_hamming_pairs_single_band_and_edges(spark):
    """bands=1 degenerates to an exact-hash equality join (the whole
    64-bit hash is one slice — no (1<<64)-1 literal overflow); invalid
    band counts are rejected."""
    import pytest as _pytest

    from enrich_spark.datapipe.dedup import hamming_pairs

    hashes = spark.createDataFrame(
        [(1, -6028811755055857236), (2, -6028811755055857236),
         (3, 42), (4, 43)],
        "doc_id LONG, h LONG")
    got = {(r.id_a, r.id_b): r.hamming for r in hamming_pairs(
        hashes, hash_col="h", max_hamming=0, bands=1).collect()}
    assert got == {(1, 2): 0}    # exact dup found incl. negative hash
    with _pytest.raises(ValueError, match="bands"):
        hamming_pairs(hashes, hash_col="h", bands=0)
    with _pytest.raises(ValueError, match="bands"):
        hamming_pairs(hashes, hash_col="h", bands=65)


def test_hamming_pairs_nondivisor_bands_match_bruteforce(spark):
    """r13 (ADVICE): band counts in 33..63 used to break at plan build
    (negative shift from ceil-width slicing) or degenerate into a
    constant-0 slice key. Even-width distribution keeps every slice
    ≥ 1 bit and the pigeonhole guarantee, so ANY bands ≥ max_hamming+1
    returns exactly the brute-force pair set."""
    from enrich_spark.datapipe.dedup import hamming_pairs

    rows = [(i, (0x9E3779B97F4A7C15 * (i // 3)) % (1 << 64)
             ^ (1 << (i % 5)) if i % 3 else
             (0x9E3779B97F4A7C15 * (i // 3)) % (1 << 64))
            for i in range(30)]
    signed = [(i, h - (1 << 64) if h >= (1 << 63) else h)
              for i, h in rows]
    brute = sorted(
        (a, b, bin(ha ^ hb).count("1"))
        for a, ha in rows for b, hb in rows
        if a < b and bin(ha ^ hb).count("1") <= 3)
    hashes = spark.createDataFrame(signed, "doc_id LONG, h LONG")
    for bands in (4, 33, 43, 63, 64):
        got = sorted(
            (r.id_a, r.id_b, r.hamming)
            for r in hamming_pairs(hashes, hash_col="h",
                                   max_hamming=3,
                                   bands=bands).collect())
        assert got == brute, f"bands={bands}"


def test_multimodal_dedup_composes_to_keep_policy(spark):
    """The full image-dedup chain composes from gated pieces:
    image_dhash -> hamming_pairs -> dup_clusters -> apply_dedup_policy
    keeps exactly one representative per near-dup image cluster (the
    highest-quality member, ties to the lowest id) and every unique
    image."""
    import math

    import numpy as np

    from enrich_spark.datapipe.dedup import (
        apply_dedup_policy, hamming_pairs,
    )
    from enrich_spark.datapipe.media_codecs import encode_bmp
    from enrich_spark.datapipe.multimodal import image_dhash

    def gradient(p, perturb=None):
        px = np.zeros((8, 9 * 3), np.uint8)
        for y in range(8):
            for x in range(9):
                v = (p * 17 + x * 29 + y * 5) % 251
                if perturb == (x, y):
                    v = (v + 40) % 251
                px[y, 3 * x:3 * x + 3] = v
        return encode_bmp(9, 8, px)

    rows = [
        # cluster A: 1 == 2 exactly, 3 a one-pixel near-dup
        (1, bytearray(gradient(10)), 50),
        (2, bytearray(gradient(10)), 90),    # best quality in cluster
        (3, bytearray(gradient(10, perturb=(4, 2))), 70),
        # two singletons
        (4, bytearray(gradient(111)), 10),
        (5, bytearray(gradient(197)), 10),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id LONG, media BINARY, quality LONG")
    hashes = image_dhash(docs).where(F.col("dhash").isNotNull())
    pairs = hamming_pairs(hashes, hash_col="dhash", max_hamming=4)
    out = {r.doc_id: r for r in apply_dedup_policy(
        docs.select("doc_id", "quality"), pairs,
        quality_col="quality").collect()}
    kept = {d for d, r in out.items() if r.is_kept}
    assert kept == {2, 4, 5}             # best-of-cluster + singletons
    assert out[1].cluster_id == out[2].cluster_id == out[3].cluster_id
    assert out[1].cluster_size == 3


def test_shard_diff_plans_incremental_export(spark):
    """shard_diff marks exactly the shards whose membership changed:
    dropping one doc flips only ITS shard to 'changed'; unchanged
    shards are 'same'; an empty old manifest makes everything
    'added'."""
    import hashlib

    from enrich_spark.datapipe.layout import (
        shard_assign, shard_diff, shard_manifest,
    )

    docs = spark.createDataFrame(
        [(i, f"text body {i}") for i in range(300)],
        "doc_id LONG, text STRING")
    new_m = shard_manifest(shard_assign(docs, 8), cols=["doc_id", "text"])
    old_m = shard_manifest(shard_assign(docs.where("doc_id <> 7"), 8),
                           cols=["doc_id", "text"])
    got = {r.shard_id: r for r in shard_diff(old_m, new_m).collect()}
    hot = int(hashlib.md5(b"0:7").hexdigest()[:15], 16) % 8
    assert got[hot].status == "changed" and got[hot].rows_delta == 1
    for sid, r in got.items():
        if sid != hot:
            assert r.status == "same" and r.rows_delta == 0

    empty = old_m.where("shard_id < 0")
    added = shard_diff(empty, new_m).collect()
    assert all(r.status == "added" for r in added)
    assert sum(r.rows_delta for r in added) == 300


def test_dhash_survives_jpeg_recompression(spark):
    """r13 (verdict #6): the r12 fixture lesson proved the FIXTURE was
    the fragile part; this proves the OPERATOR survives real
    perturbation — re-encode images through the repo's own JPEG path
    at two quality levels and the dHash stays within a small Hamming
    ball for same-image pairs while distinct images stay far.
    Measured (SCALE.md §26): same-image q92↔q55 ≤ 5 bits, q92↔q35
    ≤ 5 bits; distinct-pair minimum 14 bits — threshold 6 separates
    with margin on both sides. End-to-end: hamming_pairs over the
    mixed-quality corpus finds exactly the same-image pairs."""
    import hashlib

    import numpy as np

    from enrich_spark.datapipe.dedup import hamming_pairs
    from enrich_spark.datapipe.jpeg import encode_jpeg
    from enrich_spark.datapipe.multimodal import dhash_one, image_dhash

    def base_image(i, size=48):
        # md5-mixed per-image frequencies/phases (the r12 lesson: no
        # constant-shift arithmetic between fixture images)
        p = [b / 255.0 for b in
             hashlib.md5(f"img:{i}".encode()).digest()[:8]]
        y, x = np.mgrid[0:size, 0:size].astype(np.float64) / size
        r = 128 + 90 * np.sin(2 * np.pi * ((1 + 2 * p[0]) * x + p[1])) \
            * np.cos(2 * np.pi * ((1 + 2 * p[2]) * y + p[3]))
        g = 128 + 90 * np.sin(2 * np.pi * ((1 + 2 * p[4]) * x
                                           + (1 + 2 * p[5]) * y + p[6]))
        b = 128 + 90 * np.cos(2 * np.pi * ((1 + 2 * p[7]) * (x - y)))
        return np.stack([r, g, b], axis=2).clip(0, 255).astype(np.uint8)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    N = 12
    hq = {}
    for i in range(N):
        img = base_image(i)
        h92 = dhash_one(encode_jpeg(48, 48, img, quality=92))
        h55 = dhash_one(encode_jpeg(48, 48, img, quality=55))
        h35 = dhash_one(encode_jpeg(48, 48, img, quality=35))
        assert h92["codec"] == "jpeg"
        hq[i] = h92["dhash"]
        assert ham(h92["dhash"], h55["dhash"]) <= 6, i
        assert ham(h92["dhash"], h35["dhash"]) <= 6, i
    for i in range(N):
        for j in range(i + 1, N):
            assert ham(hq[i], hq[j]) > 10, (i, j)

    # end-to-end: the mixed-quality corpus dedups to same-image pairs
    rows = []
    for i in range(N):
        img = base_image(i)
        rows.append((2 * i, bytearray(encode_jpeg(48, 48, img,
                                                  quality=92))))
        rows.append((2 * i + 1, bytearray(encode_jpeg(48, 48, img,
                                                      quality=55))))
    df = spark.createDataFrame(rows, "doc_id LONG, media BINARY")
    pairs = sorted(
        (r.id_a, r.id_b)
        for r in hamming_pairs(image_dhash(df), hash_col="dhash",
                               max_hamming=6).collect())
    assert pairs == [(2 * i, 2 * i + 1) for i in range(N)]


def test_incremental_fingerprint_dedup_composes_with_shard_diff(spark,
                                                                tmp_path):
    """r13 (verdict #7): streaming corpora get the same near-dup
    increment for ANY 64-bit fingerprint that text has via the minhash
    index — round N exports shards + persists the fingerprint index;
    round N+1's shard_diff names the changed shards, and ONLY the new
    docs run against the stored index (new-vs-corpus pairs; old-vs-old
    is never recomputed, structurally — the corpus side of the join is
    the index table, not a self-join)."""
    import numpy as np

    from enrich_spark.datapipe.dedup import (
        build_fingerprint_index, hamming_pairs, incremental_hamming_pairs,
    )
    from enrich_spark.datapipe.layout import (
        shard_assign, shard_diff, shard_manifest,
    )
    from enrich_spark.datapipe.media_codecs import encode_bmp
    from enrich_spark.datapipe.multimodal import image_dhash

    import hashlib

    def gradient(p, perturb=None):
        # md5-mixed pixels (the r12 fixture lesson: arithmetic
        # v = f(p) + g(x,y) forms make distinct images differ by a
        # constant shift and spuriously collide under dHash)
        px = np.zeros((8, 9 * 3), np.uint8)
        for y in range(8):
            for x in range(9):
                v = int(hashlib.md5(f"{p}:{x}:{y}".encode())
                        .hexdigest()[:2], 16) % 251
                if perturb == (x, y):
                    v = (v + 40) % 251
                px[y, 3 * x:3 * x + 3] = v
        return encode_bmp(9, 8, px)

    # round N: corpus with an INTERNAL dup pair (1,2) — must never
    # reappear in the increment's output
    corpus = spark.createDataFrame(
        [(1, bytearray(gradient(10))),
         (2, bytearray(gradient(10))),          # corpus-internal dup
         (3, bytearray(gradient(50))),
         (4, bytearray(gradient(90)))],
        "doc_id LONG, media BINARY")
    index = build_fingerprint_index(
        image_dhash(corpus).where(F.col("dhash").isNotNull()),
        hash_col="dhash", max_hamming=4)
    index.write.parquet(str(tmp_path / "fp_index"))   # persisted side
    old_manifest = shard_manifest(
        shard_assign(corpus.select("doc_id"), 4), cols=["doc_id"])

    # round N+1: new shard — exact dup of 1, near dup of 3, novel
    new = spark.createDataFrame(
        [(101, bytearray(gradient(10))),
         (102, bytearray(gradient(50, perturb=(4, 2)))),
         (103, bytearray(gradient(200)))],
        "doc_id LONG, media BINARY")
    new_manifest = shard_manifest(
        shard_assign(corpus.select("doc_id")
                     .unionByName(new.select("doc_id")), 4),
        cols=["doc_id"])
    changed = {r.shard_id for r in
               shard_diff(old_manifest, new_manifest)
               .where(F.col("status") != "same").collect()}
    new_shards = {r.shard_id for r in
                  shard_assign(new.select("doc_id"), 4).collect()}
    assert new_shards <= changed          # diff names every new shard

    stored = spark.read.parquet(str(tmp_path / "fp_index"))
    pairs = {(r.new_id, r.corpus_id): r.hamming
             for r in incremental_hamming_pairs(
                 image_dhash(new).where(F.col("dhash").isNotNull()),
                 stored, hash_col="dhash", max_hamming=4).collect()}
    assert pairs[(101, 1)] == 0 and pairs[(101, 2)] == 0
    assert (102, 3) in pairs and 0 < pairs[(102, 3)] <= 4
    assert not any(n == 103 for n, _ in pairs)        # novel: no pair
    # only new-vs-corpus: the corpus-internal dup (1,2) is absent
    assert all(n in (101, 102) for n, _ in pairs)

    # parity with the batch path: union corpus+new, batch hamming_pairs,
    # restrict to new-vs-corpus pairs — identical result
    all_h = image_dhash(corpus.unionByName(new)).where(
        F.col("dhash").isNotNull())
    batch = {(max(r.id_a, r.id_b), min(r.id_a, r.id_b)): r.hamming
             for r in hamming_pairs(all_h, hash_col="dhash",
                                    max_hamming=4).collect()
             if (r.id_a > 100) != (r.id_b > 100)}
    assert batch == pairs


def test_extract_code_blocks_duckdb_parity(spark, tmp_path):
    """r14 fence extractor (text.extract_code_blocks): the prose/code
    split must be byte-identical across engines for fences, info
    strings, multiple blocks, unterminated fences (stay in prose),
    line-start anchoring, and the indent mode."""
    import duckdb
    import pandas as pd

    from enrich_spark.datapipe.text import (
        extract_code_blocks,
        extract_code_blocks_sql,
    )

    docs = [
        (0, "Intro prose.\n```python\ndef f():\n    return 1\n```\nOutro."),
        (1, "No code here, just words."),
        (2, "```\nraw block\n```"),
        (3, "Unterminated:\n```js\nlet x = 1;\n"),
        (4, "Two:\n```a\nA\n```\nmid\n```b\nB\n```\ntail"),
        (5, "Indented:\n    x = 1\n\ty = 2\nplain"),
        (6, ""),
        (7, "inline ``` not at line start ``` stays"),
        (8, "```lang info string\nbody\n```   \nafter trailing spaces"),
    ]
    pd.DataFrame(docs, columns=["doc_id", "text"]).to_parquet(
        f"{tmp_path}/fence.parquet")
    df = spark.read.parquet(f"{tmp_path}/fence.parquet")
    cols = ["doc_id", "prose_text", "code_text", "fence_langs",
            "n_fences", "code_chars", "prose_chars"]
    for inc in (False, True):
        got = sorted(tuple(r) for r in extract_code_blocks(
            df, include_indented=inc).select(*cols).collect())
        want = sorted(tuple(r) for r in duckdb.connect().execute(
            extract_code_blocks_sql(
                f"read_parquet('{tmp_path}/fence.parquet')",
                include_indented=inc)).fetchall())
        assert got == want, f"include_indented={inc}"
    by_id = {t[0]: t for t in got}
    # unterminated fence stays in prose (conservative failure mode)
    assert by_id[3][1].startswith("Unterminated") and by_id[3][4] == 0
    # two fences: bodies joined, both stripped from prose; langs in order
    assert by_id[4][2] == "A\n\nB\n" and by_id[4][1] == "Two:\nmid\ntail"
    assert by_id[4][3] == "a,b" and by_id[0][3] == "python"
    # info string: first token, lowercased
    assert by_id[8][3] == "lang"
    # indent mode moved the indented lines out of doc 5's prose
    assert by_id[5][2] == "x = 1\ny = 2" and "x = 1" not in by_id[5][1]


def test_extract_code_blocks_preserves_columns_and_plan(spark):
    """Input columns pass through; the split is zero-shuffle, zero
    Python (pure per-row regexp projection)."""
    from enrich_spark.datapipe.text import extract_code_blocks

    df = spark.createDataFrame(
        [(1, "p\n```\nc\n```\n", "web")],
        "doc_id long, text string, source string")
    out = extract_code_blocks(df)
    assert out.columns == ["doc_id", "text", "source", "prose_text",
                           "code_text", "fence_langs", "n_fences",
                           "code_chars", "prose_chars"]
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_fence_language_mix_duckdb_parity(spark, tmp_path):
    """r14 code-mix table (text.fence_language_mix): per-language
    block/char/doc counts from fence info strings, both engines."""
    import duckdb
    import pandas as pd

    from enrich_spark.datapipe.text import (
        fence_language_mix,
        fence_language_mix_sql,
    )

    docs = [
        (0, "a\n```Python copy\nx=1\n```\nb\n```js\ny\n```\nc"),
        (1, "plain, no fences at all"),
        (2, "```\nuntagged\n```"),
        (3, "```RUST ignore this\nfn main(){}\n```"),
        (4, "```python\nsecond python doc\n```"),
    ]
    pd.DataFrame(docs, columns=["doc_id", "text"]).to_parquet(
        f"{tmp_path}/fl.parquet")
    df = spark.read.parquet(f"{tmp_path}/fl.parquet")
    got = sorted(tuple(r) for r in fence_language_mix(df).collect())
    want = sorted(tuple(r) for r in duckdb.connect().execute(
        fence_language_mix_sql(
            f"read_parquet('{tmp_path}/fl.parquet')")).fetchall())
    assert got == want
    by_lang = {t[0]: t for t in got}
    # info-string first token, lowercased; untagged -> ''
    assert by_lang["python"] == ("python", 2, 22, 2)
    assert by_lang["rust"][1] == 1 and by_lang[""][1] == 1
    assert set(by_lang) == {"python", "js", "rust", ""}
