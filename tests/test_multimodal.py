"""Multimodal plumbing: schemas, Arrow batching, determinism, stub
gating.  The codec kernels are deterministic fakes (no media libs in the
container) — these tests pin the DISTRIBUTED contract: schema stability,
per-batch shapes, payload-derived determinism, column pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_practice_spark.operators import multimodal as M
from cdc_practice_spark.session import load_table


@pytest.fixture(scope="module")
def assets(spark, sf_dir):
    return M.synth_assets(load_table(spark, sf_dir, "documents")).cache()


def test_asset_schema(assets):
    assert {f.name for f in assets.schema.fields} == {
        f.name for f in M.ASSET_SCHEMA.fields
    }
    mods = {r.modality for r in assets.select("modality").distinct().collect()}
    assert mods == {"image", "audio", "video"}


def test_decode_deterministic(assets):
    d1 = {r.asset_id: r.content_sha256 for r in M.decode_assets(assets).collect()}
    d2 = {r.asset_id: r.content_sha256 for r in M.decode_assets(assets).collect()}
    assert d1 == d2
    assert len(d1) == assets.count()


def test_decode_strict_raises(assets):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError)) as exc:
        M.decode_assets(assets, strict=True).collect()
    assert "NotImplementedError" in str(exc.value)


def test_features_shape_and_determinism(assets):
    f1 = {r.asset_id: r.feature for r in M.extract_features(assets).collect()}
    assert all(len(v) == M.FEATURE_DIM for v in f1.values())
    f2 = {r.asset_id: r.feature for r in M.extract_features(assets).collect()}
    assert f1 == f2  # same payload bytes → same features, any partitioning


def test_resize_plan_bounds(assets):
    plan = M.resize_plan(assets, max_side=256)
    rows = plan.collect()
    assert rows  # images + videos present
    import math

    for r in rows:
        assert max(r.target_width, r.target_height) <= 256
        assert r.target_width >= 1 and r.target_height >= 1
        scale = min(1.0, 256 / max(r.width, r.height))
        assert r.target_width == math.ceil(r.width * scale)
        assert r.target_height == math.ceil(r.height * scale)


def test_frame_sampling(assets):
    frames = M.sample_frames(assets, every_n=30)
    per_asset = (
        frames.groupBy("asset_id")
        .agg(F.count("*").alias("n"), F.max("n_frames").alias("nf"))
        .collect()
    )
    assert per_asset
    for r in per_asset:
        assert r.n == (max(r.nf - 1, 0)) // 30 + 1  # sequence(0, nf-1, 30)


def test_bmp_roundtrip_pixel_exact():
    """synth_bmp → decode_bmp_numpy is pixel-exact against the synthesis
    formula, across widths that exercise every row-padding case (w%4 ∈
    {0,1,2,3})."""
    import numpy as np

    for asset_id, w, h in [(7, 2, 3), (11, 3, 2), (42, 4, 5), (255, 5, 4), (999, 8, 7)]:
        data = M.synth_bmp(asset_id, w, h)
        dw, dh, arr = M.decode_bmp_numpy(data)
        assert (dw, dh) == (w, h)
        expect = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                for c in range(3):
                    expect[y, x, c] = (asset_id + 7 * x + 13 * y + 31 * c) % 256
        assert np.array_equal(arr, expect), (asset_id, w, h)


def test_bmp_decoder_rejects_non_bmp():
    with pytest.raises(ValueError, match="not a BMP"):
        M.decode_bmp_numpy(b"\x89PNG\r\n\x1a\nxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx")


def test_pil_parity_with_numpy_parser():
    """When PIL is installed the decode path switches to it — its output
    must be byte-identical to the numpy parser (skips where PIL absent,
    runs in any dev environment that has it)."""
    Image = M._pil_image_module()
    if Image is None:
        pytest.skip("PIL not installed in this container")
    import io

    import numpy as np

    data = M.synth_bmp(123, 6, 5)
    with Image.open(io.BytesIO(data)) as im:
        pil_arr = np.asarray(im.convert("RGB"))
    _, _, np_arr = M.decode_bmp_numpy(data)
    assert np.array_equal(pil_arr, np_arr)


def test_decode_images_runs_distributed(spark, sf_dir):
    """decode_images over synthesized BMP assets: row-per-asset, dims
    decoded FROM THE PAYLOAD match the synthesis dims."""
    docs = load_table(spark, sf_dir, "documents").limit(40)
    out = M.decode_images(M.synth_image_assets(docs)).collect()
    assert len(out) == 40
    for r in out:
        assert r.width == r.asset_id % 8 + 2
        assert r.height == r.asset_id % 6 + 2
        assert 0.0 <= r.mean_pixel <= 255.0


def test_png_roundtrip_pixel_exact():
    """synth_png → decode_png_numpy is pixel-exact against the synthesis
    formula.  Heights ≥ 6 guarantee every PNG filter type (y % 5) is
    exercised, so Sub/Up/Average/Paeth unfilter kernels are all covered."""
    import numpy as np

    for asset_id, w, h in [(0, 2, 6), (7, 5, 7), (123, 9, 6), (255, 10, 8), (999, 3, 11)]:
        data = M.synth_png(asset_id, w, h)
        dw, dh, arr = M.decode_png_numpy(data)
        assert (dw, dh) == (w, h)
        ys, xs, cs = np.meshgrid(
            np.arange(h), np.arange(w), np.arange(3), indexing="ij"
        )
        expect = ((asset_id + 7 * xs + 13 * ys + 31 * cs) % 256).astype(np.uint8)
        assert np.array_equal(arr, expect), (asset_id, w, h)


def test_png_is_really_compressed_and_crc_checked():
    """The IDAT stream must be genuine DEFLATE (smaller than raw pixels
    for these regular gradients), and a flipped byte anywhere must be
    caught by the chunk CRC walk — the properties that make this a real
    compressed-codec path rather than a container format."""
    data = M.synth_png(42, 10, 10)
    assert len(data) < 10 * 10 * 3  # compression actually happened
    bad = bytearray(data)
    bad[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        M.decode_png_numpy(bytes(bad))
    with pytest.raises(ValueError, match="not a PNG"):
        M.decode_png_numpy(b"BMxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx")


def test_decode_images_dispatches_png(spark, sf_dir):
    """decode_images routes PNG payloads to the numpy+zlib kernel: dims
    decoded FROM THE DECOMPRESSED PAYLOAD match the synthesis dims."""
    docs = load_table(spark, sf_dir, "documents").limit(40)
    out = M.decode_images(M.synth_png_assets(docs)).collect()
    assert len(out) == 40
    for r in out:
        assert r.width == r.asset_id % 9 + 2
        assert r.height == r.asset_id % 5 + 2
        assert 0.0 <= r.mean_pixel <= 255.0


def test_wav_roundtrip_sample_exact():
    import numpy as np

    for asset_id, n in [(0, 1), (7, 20), (12345, 499), (10**10, 64)]:
        rate, s = M.decode_wav_numpy(M.synth_wav(asset_id, n))
        assert rate == 16000 and len(s) == n
        i = np.arange(n, dtype=np.int64)
        expect = ((asset_id * 31 + i * 17) % 65536 - 32768).astype(np.int16)
        assert np.array_equal(s, expect), (asset_id, n)


def test_wav_decoder_walks_extra_chunks_and_rejects_bad():
    import numpy as np
    import pytest as _pt

    # insert a LIST chunk (odd size → word-aligned) between fmt and data:
    # a real parser must skip it, not mistake it for samples
    wav = M.synth_wav(42, 10)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"  # pad byte
    patched = wav[:fmt_end] + extra + wav[fmt_end:]
    rate, s = M.decode_wav_numpy(patched)
    assert rate == 16000 and len(s) == 10
    _, s0 = M.decode_wav_numpy(wav)
    assert np.array_equal(s, s0)

    with _pt.raises(ValueError, match="not a WAV"):
        M.decode_wav_numpy(b"RIFFxxxxJUNK" + b"\x00" * 40)


def test_soundfile_parity_with_numpy_parser():
    sf_mod = M._soundfile_module()
    if sf_mod is None:
        pytest.skip("soundfile not installed in this container")
    import io

    import numpy as np

    data = M.synth_wav(123, 50)
    samples, rate = sf_mod.read(io.BytesIO(data), dtype="int16")
    r2, s2 = M.decode_wav_numpy(data)
    assert rate == r2 and np.array_equal(np.asarray(samples), s2)


def test_avi_roundtrip_frame_exact():
    import numpy as np

    for asset_id, w, h, nf in [(3, 2, 2, 1), (44, 5, 3, 4), (1001, 7, 5, 5)]:
        dw, dh, frames = M.decode_avi_numpy(M.synth_avi(asset_id, w, h, nf))
        assert (dw, dh, len(frames)) == (w, h, nf)
        for f, arr in enumerate(frames):
            expect = np.zeros((h, w, 3), dtype=np.uint8)
            for y in range(h):
                for x in range(w):
                    for c in range(3):
                        expect[y, x, c] = (asset_id + 7 * x + 13 * y + 31 * c + 97 * f) % 256
            assert np.array_equal(arr, expect), (asset_id, w, h, f)


def test_avi_decoder_rejects_non_avi():
    with pytest.raises(ValueError, match="not an AVI"):
        M.decode_avi_numpy(M.synth_wav(1, 10))  # a WAV is RIFF but not AVI


def test_decode_video_per_frame_rows(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(30)
    out = M.decode_video(M.synth_video_assets(docs)).collect()
    by_asset = {}
    for r in out:
        by_asset.setdefault(r.asset_id, []).append(r.frame_idx)
        assert r.width == r.asset_id % 6 + 2
        assert r.height == r.asset_id % 4 + 2
    for aid, idxs in by_asset.items():
        assert sorted(idxs) == list(range(aid % 5 + 1))  # every frame, once


def test_gif_lzw_roundtrip_exercises_width_bumps():
    """The fixture GIFs are tiny (9-bit codes only); this pins the
    deep-dictionary paths: width bumps 9→10→11→12, the 4096 CLEAR
    reset, and the KwKwK special case, on both random (incompressible)
    and structured (20× compressible) streams."""
    import numpy as np

    from cdc_practice_spark.operators.multimodal import (
        decode_gif_numpy,
        lzw_decode_gif,
        lzw_encode_gif,
        synth_gif,
    )

    rng = np.random.RandomState(7)
    idx = rng.randint(0, 256, size=120_000).astype(np.uint8)
    assert lzw_decode_gif(lzw_encode_gif(idx.tobytes())) == idx.tobytes()
    rep = np.tile(np.arange(64, dtype=np.uint8), 3000)
    enc = lzw_encode_gif(rep.tobytes())
    assert lzw_decode_gif(enc) == rep.tobytes()
    assert len(enc) * 10 < len(rep)  # actually compresses
    # full-container pixel exactness
    data = synth_gif(42, 8, 5)
    w, h, arr = decode_gif_numpy(data)
    ys, xs = np.meshgrid(np.arange(5), np.arange(8), indexing="ij")
    expect = ((42 + 7 * xs + 13 * ys) % 256).astype(np.uint8)
    assert (w, h) == (8, 5) and (arr == expect[..., None]).all()


def test_phash_near_dup_planted_pair(spark):
    """Two images differing in ONE pixel must land within hamming ≤ 2
    and pair up; a structurally different image (inverted gradient) and
    a different-dims image must not pair with them."""
    import pandas as pd

    from cdc_practice_spark.operators.multimodal import (
        decode_bmp_numpy,
        phash_images,
        phash_near_pairs,
        synth_bmp,
    )

    base = synth_bmp(5, 8, 6)
    # variant: flip one pixel's blue channel byte in the raw payload
    variant = bytearray(base)
    variant[54] = (variant[54] + 120) % 256  # first stored pixel, B channel
    variant = bytes(variant)
    # sanity: still a valid BMP, exactly one byte differs
    w, h, arr = decode_bmp_numpy(variant)
    assert (w, h) == (8, 6)
    inverted = synth_bmp(200, 8, 6)  # far-away brightness pattern
    other_dims = synth_bmp(5, 4, 3)
    assets = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": [1, 2, 3, 4],
                "content": [base, variant, inverted, other_dims],
            }
        )
    )
    hashes = phash_images(assets)
    pairs = phash_near_pairs(hashes, max_hamming=2)
    got = {(r.asset_a, r.asset_b): r.hamming for r in pairs.collect()}
    assert (1, 2) in got  # the planted near-dup
    assert got[(1, 2)] <= 2
    assert all(4 not in p for p in got)  # dims block: never a candidate
