"""IQ*-lattice + Q1_0 GGUF dequant tests.

The vectorized decoders in io/gguf.py are checked byte-for-byte against
independent scalar decoders written here straight from the block-format spec
(reference behavior: /root/reference/utils/gguf.py:73-119). The IQ3/IQ2
lattice codebooks are clustering-derived data shipped with ggml (not present
in this sandbox) — tests inject synthetic random grids via
ggml_grids.set_grids, which exercises every bit of packing logic; the real
tables drop in via tools/extract_ggml_grids.py without code changes.
"""
import numpy as np
import pytest

from clearcam_tpu.io import gguf, ggml_grids


@pytest.fixture
def synthetic_grids():
    rng = np.random.default_rng(42)
    raw = {
        "iq3xxs_grid": rng.integers(0, 2**32, 256, dtype=np.uint64)
        .astype(np.uint32),
        "iq3s_grid": rng.integers(0, 2**32, 512, dtype=np.uint64)
        .astype(np.uint32),
        "iq2s_grid": rng.integers(0, 2**64 - 1, 1024, dtype=np.uint64),
    }
    ggml_grids.set_grids(raw)
    yield {name: ggml_grids.words_to_bytes(
        np.asarray(words, ggml_grids.GRID_SPECS[name][0]),
        ggml_grids.GRID_SPECS[name][2]) for name, words in raw.items()}
    ggml_grids.set_grids(None)


def _f16(b):
    return float(np.frombuffer(bytes(b), np.float16)[0])


def _rand_blocks(nblocks, nbytes, seed):
    rng = np.random.default_rng(seed)
    raw = rng.integers(0, 256, nblocks * nbytes, dtype=np.uint64).astype(np.uint8)
    # keep the f16 scale at the block head finite and sane
    for i in range(nblocks):
        raw[i * nbytes:i * nbytes + 2] = np.array(
            [rng.uniform(0.1, 2.0)], np.float16).view(np.uint8)
    return raw


def test_sign_parity_table():
    t = ggml_grids.sign_parity_table()
    assert t.shape == (128,)
    # every entry has even popcount and preserves the low 7 bits
    for i, v in enumerate(t):
        assert v & 0x7F == i
        assert bin(int(v)).count("1") % 2 == 0


def _scalar_iq3xxs(b, grid, ksigns):
    out = np.zeros(256, np.float32)
    d = _f16(b[0:2])
    qs = b[2:66]
    words = np.frombuffer(bytes(b[66:98]), "<u4")
    for sub in range(8):
        w = int(words[sub])
        db = d * ((w >> 28) + 0.5) * 0.5
        for g in range(4):
            sbyte = int(ksigns[(w >> (7 * g)) & 0x7F])
            for j in range(8):
                byte_idx = sub * 8 + g * 2 + j // 4
                val = float(grid[qs[byte_idx], j % 4])
                sign = -1.0 if (sbyte >> j) & 1 else 1.0
                out[sub * 32 + g * 8 + j] = db * val * sign
    return out


def test_dequant_iq3_xxs_random_blocks(synthetic_grids):
    raw = _rand_blocks(3, 98, seed=1)
    out = gguf.dequant(raw, 3 * 256, 18)
    expect = np.concatenate([
        _scalar_iq3xxs(raw[i * 98:(i + 1) * 98],
                       synthetic_grids["iq3xxs_grid"], ggml_grids.KSIGNS)
        for i in range(3)])
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def _scalar_iq3s(b, grid):
    out = np.zeros(256, np.float32)
    d = _f16(b[0:2])
    qs, qh, sgns, sl = b[2:66], b[66:74], b[74:106], b[106:110]
    for sub in range(8):
        nib = (sl[sub // 2] & 0xF) if sub % 2 == 0 else (sl[sub // 2] >> 4)
        scale = 1.0 + 2.0 * nib
        for g in range(4):
            sbyte = int(sgns[sub * 4 + g])
            for j in range(8):
                byte_idx = sub * 8 + g * 2 + j // 4
                hi = (qh[byte_idx // 8] >> (byte_idx % 8)) & 1
                qi = int(qs[byte_idx]) | (int(hi) << 8)
                sign = -1.0 if (sbyte >> j) & 1 else 1.0
                out[sub * 32 + g * 8 + j] = d * scale * float(grid[qi, j % 4]) * sign
    return out


def test_dequant_iq3_s_random_blocks(synthetic_grids):
    raw = _rand_blocks(3, 110, seed=2)
    out = gguf.dequant(raw, 3 * 256, 21)
    expect = np.concatenate([
        _scalar_iq3s(raw[i * 110:(i + 1) * 110], synthetic_grids["iq3s_grid"])
        for i in range(3)])
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def _scalar_iq2s(b, grid):
    out = np.zeros(256, np.float32)
    d = _f16(b[0:2])
    qs, sgns, qh, sc = b[2:34], b[34:66], b[66:74], b[74:82]
    for grp in range(16):
        nib = (sc[grp // 2] & 0xF) if grp % 2 == 0 else (sc[grp // 2] >> 4)
        db = d * (nib + 0.5) * 0.25
        for h in range(2):
            gi = grp * 2 + h
            crumb = (qh[gi // 4] >> (2 * (gi % 4))) & 3
            qi = int(qs[gi]) | (int(crumb) << 8)
            sbyte = int(sgns[gi])
            for j in range(8):
                sign = -1.0 if (sbyte >> j) & 1 else 1.0
                out[grp * 16 + h * 8 + j] = db * float(grid[qi, j]) * sign
    return out


def test_dequant_iq2_s_random_blocks(synthetic_grids):
    raw = _rand_blocks(3, 82, seed=3)
    out = gguf.dequant(raw, 3 * 256, 22)
    expect = np.concatenate([
        _scalar_iq2s(raw[i * 82:(i + 1) * 82], synthetic_grids["iq2s_grid"])
        for i in range(3)])
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def _scalar_iq4xs(b):
    out = np.zeros(256, np.float32)
    d = _f16(b[0:2])
    sh = int(np.frombuffer(bytes(b[2:4]), "<u2")[0])
    sl, qs = b[4:8], b[8:136]
    for sub in range(8):
        lo = (sl[sub // 2] & 0xF) if sub % 2 == 0 else (sl[sub // 2] >> 4)
        hi = (sh >> (2 * sub)) & 3
        scale = float((int(lo) | (hi << 4)) - 32)
        for j in range(32):
            byte = qs[sub * 16 + j % 16]
            nib = (byte & 0xF) if j < 16 else (byte >> 4)
            out[sub * 32 + j] = d * scale * float(ggml_grids.KVALUES_IQ4NL[nib])
    return out


def test_dequant_iq4_xs_random_blocks():
    raw = _rand_blocks(3, 136, seed=4)
    out = gguf.dequant(raw, 3 * 256, 23)
    expect = np.concatenate(
        [_scalar_iq4xs(raw[i * 136:(i + 1) * 136]) for i in range(3)])
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_dequant_iq4_xs_hand_block():
    """Uniform hand-built block: all nibbles = 8 (-> kvalue 1), all sub-scales
    lo=2/hi=1 (-> (2|16)-32 = -14), d = 0.5 -> every element -7."""
    blk = np.zeros(136, np.uint8)
    blk[0:2] = np.array([0.5], np.float16).view(np.uint8)
    blk[2:4] = np.frombuffer(np.uint16(0b0101010101010101).tobytes(), np.uint8)
    blk[4:8] = 2 | (2 << 4)
    blk[8:136] = 8 | (8 << 4)
    out = gguf.dequant(blk, 256, 23)
    np.testing.assert_allclose(out, 0.5 * -14 * 1.0)


def test_dequant_q1_0():
    """Binary quant: value = +-d per bit, LSB-first within each byte."""
    blk = np.zeros(18, np.uint8)
    blk[0:2] = np.array([1.5], np.float16).view(np.uint8)
    blk[2] = 0b00000101            # elements 0,2 set -> +d; 1,3..7 -> -d
    blk[17] = 0xFF                 # last 8 elements all +d
    out = gguf.dequant(blk, 128, 41)
    assert out.shape == (128,)
    np.testing.assert_allclose(out[:4], [1.5, -1.5, 1.5, -1.5])
    np.testing.assert_allclose(out[8:120], -1.5)
    np.testing.assert_allclose(out[120:], 1.5)


def test_iq_grid_missing_message(tmp_path, monkeypatch):
    """Without the codebook npz, IQ3/IQ2 dequant raises a pointer to the
    extractor tool instead of a silent wrong answer."""
    ggml_grids.set_grids(None)
    monkeypatch.setenv("CLEARCAM_GGML_GRIDS", str(tmp_path / "absent.npz"))
    monkeypatch.chdir(tmp_path)
    with pytest.raises(FileNotFoundError, match="extract_ggml_grids"):
        gguf.dequant(np.zeros(98, np.uint8), 256, 18)


def test_grids_npz_roundtrip(tmp_path, monkeypatch):
    """set via npz file: load_grids byte-expands the packed words."""
    rng = np.random.default_rng(7)
    raw = {"iq3xxs_grid": rng.integers(0, 2**32, 256).astype(np.uint32),
           "iq3s_grid": rng.integers(0, 2**32, 512).astype(np.uint32),
           "iq2s_grid": rng.integers(0, 2**63, 1024).astype(np.uint64)}
    p = tmp_path / "grids.npz"
    np.savez(p, **raw)
    ggml_grids.set_grids(None)
    monkeypatch.setenv("CLEARCAM_GGML_GRIDS", str(p))
    try:
        g = ggml_grids.load_grids()
        assert g["iq3xxs_grid"].shape == (256, 4)
        assert g["iq3s_grid"].shape == (512, 4)
        assert g["iq2s_grid"].shape == (1024, 8)
        w = int(raw["iq2s_grid"][5])
        np.testing.assert_array_equal(
            g["iq2s_grid"][5], [(w >> (8 * i)) & 0xFF for i in range(8)])
    finally:
        ggml_grids.set_grids(None)


def test_fetch_weights_extracts_grids_offline(tmp_path, monkeypatch):
    """fetch_weights --models ggml-grids with the header already present
    (no network touched): the post-step extracts weights/ggml_grids.npz
    and load_grids() accepts it — the fresh-deployment IQ3/IQ2 story."""
    import importlib.util
    import pytest as _pytest
    from clearcam_tpu.io import ggml_grids
    from clearcam_tpu.tools import fetch_weights

    rng = np.random.default_rng(0)
    lines = []
    for name, (dt, n, nb) in ggml_grids.GRID_SPECS.items():
        vals = rng.integers(0, 1 << (8 * nb), n, np.uint64)
        body = ", ".join(f"0x{v:x}" for v in vals)
        ctype = "uint32_t" if nb == 4 else "uint64_t"
        lines.append(f"GGML_TABLE_BEGIN({ctype}, {name}, {n})\n"
                     f"{body},\nGGML_TABLE_END()\n")
    dest = tmp_path / "w"
    dest.mkdir()
    (dest / "ggml-common.h").write_text("\n".join(lines))

    with _pytest.raises(SystemExit) as ei:
        fetch_weights.main(["--dest", str(dest),
                            "--fixtures", str(tmp_path / "f"),
                            "--models", "ggml-grids"])
    assert ei.value.code == 0
    assert (dest / "ggml_grids.npz").exists()
    monkeypatch.setenv("CLEARCAM_GGML_GRIDS", str(dest / "ggml_grids.npz"))
    ggml_grids.set_grids(None)
    try:
        grids = ggml_grids.load_grids()
        assert grids["iq2s_grid"].shape == (1024, 8)
        assert grids["iq3xxs_grid"].shape == (256, 4)
    finally:
        ggml_grids.set_grids(None)


def test_extractor_parses_c_and_python(tmp_path):
    """tools/extract_ggml_grids.py pulls tables from both source styles."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "extract_ggml_grids",
        str(__import__("pathlib").Path(__file__).parent.parent
            / "tools/extract_ggml_grids.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    c_src = ("GGML_TABLE_BEGIN(uint32_t, tbl, 4)\n"
             "    0x01020304, 0x05060708,\n    0x090a0b0c, 0x0d0e0f10,\n"
             "GGML_TABLE_END()\n")
    vals = mod.extract_table(c_src, "tbl", 4)
    assert vals.tolist() == [0x01020304, 0x05060708, 0x090a0b0c, 0x0d0e0f10]

    c_src2 = "static const uint64_t other[2] = {0xff, 0x100};"
    assert mod.extract_table(c_src2, "other", 2).tolist() == [0xFF, 0x100]

    py_src = "tbl2 = [0x1, 0x2, 3, 4]\n"
    assert mod.extract_table(py_src, "tbl2", 4).tolist() == [1, 2, 3, 4]
