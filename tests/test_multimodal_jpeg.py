"""Baseline JPEG kernel (operators/multimodal.py): pixel-exact round
trips for the DC-only profile the oracle gates, and the general AC
entropy/IDCT path against an INDEPENDENT double-loop IDCT reference —
the encoder and decoder share the module's zigzag/Huffman constants, so
a shared-constant transposition cancels in round-trip; the reference
IDCT (plus zigzag spot values) breaks that symmetry.
"""

from __future__ import annotations

import numpy as np
import pytest

from cdc_practice_spark.operators.multimodal import (
    JPEG_ZIGZAG,
    decode_jpeg_numpy,
    jpeg_encode_baseline_gray,
    synth_jpeg,
)


def _ref_idct(S: np.ndarray) -> np.ndarray:
    """ITU-T T.81 A.3.3, literal double loop — deliberately not the
    decoder's matrix form."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            acc = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    acc += (
                        cu
                        * cv
                        * S[v, u]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[y, x] = acc / 4
    return out


@pytest.mark.parametrize(
    "aid,w,h", [(0, 10, 9), (7, 18, 13), (123, 11, 12), (255, 16, 16), (9999, 17, 10)]
)
def test_block_constant_round_trip_pixel_exact(aid, w, h):
    dw, dh, img = decode_jpeg_numpy(synth_jpeg(aid, w, h))
    assert (dw, dh) == (w, h)
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    want = ((aid + 7 * (xs // 8) + 13 * (ys // 8)) % 256).astype(np.uint8)
    assert (img == want).all()


def test_ac_coefficients_match_independent_idct():
    rng = np.random.default_rng(42)
    blocks = []
    for _ in range(4):
        blk = np.zeros((8, 8), np.int32)
        for _ in range(6):  # sparse ACs: exercises runs, ZRL, negatives
            u, v = rng.integers(0, 8, 2)
            blk[v, u] = int(rng.integers(-200, 200))
        blocks.append(blk)
    dw, dh, img = decode_jpeg_numpy(jpeg_encode_baseline_gray(blocks, 32, 8))
    assert (dw, dh) == (32, 8)
    for i, blk in enumerate(blocks):
        want = np.clip(np.round(_ref_idct(blk.astype(float))) + 128, 0, 255).astype(
            np.uint8
        )
        assert (img[0:8, i * 8 : (i + 1) * 8] == want).all(), f"block {i}"


def test_dense_blocks_and_zrl_paths():
    rng = np.random.default_rng(7)
    # fully dense block (no EOB), and a block whose only AC sits at the
    # end of the zigzag after >16 zeros (forces ZRL emission)
    dense = rng.integers(-80, 80, (8, 8)).astype(np.int32)
    sparse_tail = np.zeros((8, 8), np.int32)
    sparse_tail[0, 0] = 40
    sparse_tail[7, 7] = -3
    blocks = [dense, sparse_tail]
    _, _, img = decode_jpeg_numpy(jpeg_encode_baseline_gray(blocks, 16, 8))
    for i, blk in enumerate(blocks):
        want = np.clip(np.round(_ref_idct(blk.astype(float))) + 128, 0, 255).astype(
            np.uint8
        )
        assert (img[0:8, i * 8 : (i + 1) * 8] == want).all()


def test_zigzag_spot_values():
    # breaks encoder/decoder constant symmetry: T.81 Figure 5 prefix
    assert JPEG_ZIGZAG[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert JPEG_ZIGZAG[63] == 63 and sorted(JPEG_ZIGZAG) == list(range(64))


def test_unsupported_profiles_raise():
    with pytest.raises(ValueError):
        decode_jpeg_numpy(b"\x89PNG\r\n\x1a\n")
    # corrupt a marker: flip SOF0 to SOF2 (progressive)
    data = bytearray(synth_jpeg(1, 10, 9))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg_numpy(bytes(data))
