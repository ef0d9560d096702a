"""Remaining GGUF coverage: Q4_1/Q5_1/Q5_K/MXFP4/bf16 dequant and
multi-part split auto-merge (reference behavior utils/gguf.py:46-119,
152-156)."""
import numpy as np

from clearcam_tpu.io import gguf


def _f16(v):
    return np.array([v], np.float16).view(np.uint8)


def test_dequant_q4_1():
    """value = nibble * d + m."""
    nib = np.arange(16, dtype=np.uint8)
    raw = np.concatenate([_f16(0.5), _f16(3.0), (nib | (nib << 4))])
    out = gguf.dequant(raw, 32, 3)
    expected = np.concatenate([np.arange(16) * 0.5 + 3.0] * 2)
    np.testing.assert_allclose(out, expected)


def test_dequant_q5_1():
    """5-bit: nibble + 16*high_bit, value = q*d + m."""
    qh = np.frombuffer(np.uint32(0b1111).tobytes(), np.uint8)  # elems 0-3 high
    qs = np.zeros(16, np.uint8)
    qs[0] = 5 | (7 << 4)          # elem 0 -> 5, elem 16 -> 7
    raw = np.concatenate([_f16(2.0), _f16(1.0), qh, qs])
    out = gguf.dequant(raw, 32, 7)
    assert out[0] == (5 + 16) * 2.0 + 1.0       # low nibble + high bit
    assert out[16] == 7 * 2.0 + 1.0             # high nibble, no high bit
    assert out[1] == 16 * 2.0 + 1.0             # qh bit only (elems 0-3 set)
    assert out[4] == 1.0                        # past the set qh bits


def test_dequant_q5_k():
    """Uniform Q5_K block: nibbles 5 + qh plane bits -> q=21, scales=2,
    mins=1, d=1, dmin=0.5 -> value = 1*2*21 - 0.5*1 = 41.5."""
    blk = np.zeros(176, np.uint8)
    blk[0:2] = _f16(1.0)
    blk[2:4] = _f16(0.5)
    blk[4:8] = 2                       # sc[0..3]
    blk[8:12] = 1                      # mn[0..3]
    blk[12:16] = (2 & 0xF) | ((1 & 0xF) << 4)
    blk[16:48] = 0xFF                  # qh: every plane bit set -> +16
    blk[48:176] = 5 | (5 << 4)
    out = gguf.dequant(blk, 256, 13)
    np.testing.assert_allclose(out, 1.0 * 2 * 21 - 0.5 * 1)


def test_dequant_mxfp4():
    """e8 scale (bias 127 -> e=128 is 2.0... check: d bits (e-1)<<23) with
    fp4 codes from the lut."""
    blk = np.zeros(17, np.uint8)
    blk[0] = 128                          # d = 2^(128-128) = 1.0
    blk[1:17] = 0x5 | (0x5 << 4)          # code 5 -> 6.0
    out = gguf.dequant(blk, 32, 39)
    np.testing.assert_allclose(out, 6.0)
    blk[0] = 129                          # d = 2.0
    out = gguf.dequant(blk, 32, 39)
    np.testing.assert_allclose(out, 12.0)
    blk[1] = 0xD | (0x0 << 4)             # code 13 -> -6.0 ; code 0 -> 0
    out = gguf.dequant(blk, 32, 39)
    assert out[0] == -12.0 and out[16] == 0.0


def test_dequant_bf16():
    vals = np.array([1.5, -2.25, 1e10], np.float32)
    raw = (vals.view(np.uint32) >> 16).astype(np.uint16).view(np.uint8)
    out = gguf.dequant(raw, 3, 30)
    # decode restores exactly the truncated-mantissa value
    expected = (vals.view(np.uint32) & 0xFFFF0000).view(np.float32)
    np.testing.assert_array_equal(out, expected)


def test_multipart_split_merge(tmp_path):
    """-00001-of-00002 style splits auto-merge on load (gguf.py:152-156)."""
    a = {"x": np.arange(6, dtype=np.float32).reshape(2, 3)}
    b = {"y": np.ones((4,), np.float32)}
    gguf.save(tmp_path / "m-00001-of-00002.gguf",
              {"split.count": 2, "split.no": 0}, a)
    gguf.save(tmp_path / "m-00002-of-00002.gguf",
              {"split.count": 2, "split.no": 1}, b)
    kv, tensors = gguf.load(tmp_path / "m-00001-of-00002.gguf")
    assert set(tensors) == {"x", "y"}
    np.testing.assert_array_equal(tensors["x"], a["x"])
    np.testing.assert_array_equal(tensors["y"], b["y"])


def test_save_nondefault_alignment_roundtrip(tmp_path):
    """save(alignment=64) must write general.alignment into the KV —
    readers default to 32 and would otherwise compute a wrong data start
    (silent 32-byte-shifted weight corruption whenever ceil32 != ceil64)."""
    rng = np.random.default_rng(0)
    # pick names so the header end is unlikely to be 64-aligned by luck
    tensors = {"a.weight": rng.normal(size=(3, 5)).astype(np.float32),
               "bb.weight": rng.normal(size=(7,)).astype(np.float32)}
    p = tmp_path / "m64.gguf"
    gguf.save(p, {"general.name": "t"}, tensors, alignment=64)
    kv, sd = gguf.load(p)
    assert int(kv["general.alignment"]) == 64
    for k, v in tensors.items():
        np.testing.assert_array_equal(sd[k], v)
