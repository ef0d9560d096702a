"""TS->fMP4 remux (air-gapped day playback, VERDICT r3 item 3).

No ffmpeg exists in this sandbox, so the golden `.ts` fixture is built by an
independent ENCODE-side implementation living in this test (exp-golomb SPS
writer, PES packetizer with PTS/DTS, TS mux with PAT/PMT + real MPEG CRC32 +
adaptation-field stuffing) — everything io/mpegts.py + io/h264.py must
invert. The fMP4 output is then structurally validated by an in-test ISO
box parser: ftyp/moov/avcC geometry, per-fragment trun sample sizes vs mdat
bytes, tfdt monotonicity across recorder restarts (timestamp rebase), and
byte-identical AVCC payload recovery.
"""
import struct

import pytest

from clearcam_tpu.io import fmp4, h264, mpegts


# ---------------------------------------------------------------------------
# encode side (test-local, independent of the library code under test)
# ---------------------------------------------------------------------------

class BitWriter:
    def __init__(self):
        self.bits = []

    def u(self, val, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)

    def ue(self, val):
        v = val + 1
        n = v.bit_length()
        self.u(0, n - 1)
        self.u(v, n)

    def bytes_aligned(self):
        # rbsp_stop_one_bit + alignment zeros
        self.bits.append(1)
        while len(self.bits) % 8:
            self.bits.append(0)
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def make_sps(width, height):
    """Baseline-profile SPS for 16-divisible width and any height
    (frame cropping encodes the remainder)."""
    assert width % 16 == 0
    w = BitWriter()
    w.u(66, 8)            # profile_idc baseline
    w.u(0xC0, 8)          # constraint flags
    w.u(30, 8)            # level 3.0
    w.ue(0)               # sps id
    w.ue(0)               # log2_max_frame_num_minus4
    w.ue(0)               # pic_order_cnt_type
    w.ue(0)               # log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)               # max_num_ref_frames
    w.u(0, 1)             # gaps_in_frame_num
    w.ue(width // 16 - 1)
    h_map = (height + 15) // 16
    w.ue(h_map - 1)
    w.u(1, 1)             # frame_mbs_only
    w.u(1, 1)             # direct_8x8
    crop_b = (h_map * 16 - height) // 2     # chroma 4:2:0: units of 2
    if crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(0)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(0, 1)
    w.u(0, 1)             # vui absent
    return b"\x67" + w.bytes_aligned()


PPS = b"\x68\xce\x38\x80"    # minimal pic_parameter_set


def crc32_mpeg(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for byte in data:
        crc ^= byte << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7 if crc & 0x80000000
                   else crc << 1) & 0xFFFFFFFF
    return crc


def psi_section(table_id: int, body: bytes, ext: int = 1) -> bytes:
    sec = bytes([table_id]) + struct.pack(">H", 0xB000 | (len(body) + 9)) \
        + struct.pack(">H", ext) + bytes([0xC1, 0, 0]) + body
    return b"\x00" + sec + struct.pack(">I", crc32_mpeg(sec))


def pat(pmt_pid=0x1000):
    return psi_section(0x00, struct.pack(">HH", 1, 0xE000 | pmt_pid))


def pmt(video_pid=0x100):
    body = struct.pack(">HH", 0xE000 | video_pid, 0xF000)  # PCR pid, no desc
    body += bytes([0x1B]) + struct.pack(">HH", 0xE000 | video_pid, 0xF000)
    return psi_section(0x02, body)


def pes(au_annexb: bytes, pts: int, dts: int) -> bytes:
    def ts5(marker, t):
        return bytes([(marker << 4) | (((t >> 30) & 7) << 1) | 1,
                      (t >> 22) & 0xFF, (((t >> 15) & 0x7F) << 1) | 1,
                      (t >> 7) & 0xFF, ((t & 0x7F) << 1) | 1])
    hdr = ts5(3, pts) + ts5(1, dts)
    return b"\x00\x00\x01\xe0" + struct.pack(">H", 0) \
        + bytes([0x80, 0xC0, len(hdr)]) + hdr + au_annexb


class TSWriter:
    def __init__(self):
        self.out = bytearray()
        self.cc = {}

    def packets(self, pid: int, payload: bytes, pusi: bool):
        first = True
        while payload or first:
            cc = self.cc.get(pid, 0)
            self.cc[pid] = (cc + 1) & 0xF
            hdr = bytes([0x47, (0x40 if pusi and first else 0) | (pid >> 8),
                         pid & 0xFF])
            room = 184
            if len(payload) < room:
                # adaptation-field stuffing pads the final packet to 188
                af_len = room - len(payload) - 1
                hdr += bytes([0x30 | cc, af_len])
                if af_len:
                    hdr += bytes([0]) + b"\xff" * (af_len - 1)
                self.out += hdr + payload
                payload = b""
            else:
                hdr += bytes([0x10 | cc])
                self.out += hdr + payload[:room]
                payload = payload[room:]
            first = False


def annexb(*nals):
    return b"".join(b"\x00\x00\x00\x01" + n for n in nals)


def fake_slice(kind: int, seq: int, size: int = 40) -> bytes:
    """Syntactically inert slice payload: header byte + bytes with no start
    codes and a nonzero tail (rbsp_stop_one_bit invariant)."""
    body = bytes((seq * 7 + i) % 199 + 1 for i in range(size - 2)) + b"\x80"
    return bytes([kind]) + body


def make_segment(width=320, height=180, n_frames=10, fps=30, t0=0,
                 seq0=0) -> tuple[bytes, list]:
    """One HLS-style TS segment: IDR+SPS+PPS first, non-IDR after; returns
    (ts_bytes, [(pts, dts, avcc_payload)] expected)."""
    w = TSWriter()
    w.packets(0, pat(), True)
    w.packets(0x1000, pmt(), True)
    sps = make_sps(width, height)
    expect = []
    for i in range(n_frames):
        dts = t0 + i * (90000 // fps)
        pts = dts + (90000 // fps)       # constant reorder delay
        if i == 0:
            nals = [sps, PPS, fake_slice(0x65, seq0 + i)]
        else:
            nals = [fake_slice(0x41, seq0 + i)]
        w.packets(0x100, pes(annexb(*nals), pts, dts), True)
        keep = [n for n in nals if h264.nal_type(n) not in
                (h264.NAL_SPS, h264.NAL_PPS, h264.NAL_AUD)]
        expect.append((pts, dts, b"".join(
            struct.pack(">I", len(n)) + n for n in keep)))
    return bytes(w.out), expect


# ---------------------------------------------------------------------------
# decode-side box parser (test-local)
# ---------------------------------------------------------------------------

def walk_boxes(buf: bytes, containers=(b"moov", b"trak", b"mdia", b"minf",
                                       b"stbl", b"moof", b"traf", b"mvex")):
    """-> flat [(kind, payload_bytes)] with container recursion."""
    out = []
    i = 0
    while i + 8 <= len(buf):
        size = struct.unpack(">I", buf[i:i + 4])[0]
        kind = buf[i + 4:i + 8]
        assert size >= 8, f"bad box size at {i}"
        payload = buf[i + 8:i + size]
        out.append((kind, payload))
        if kind in containers:
            out += walk_boxes(payload, containers)
        i += size
    assert i == len(buf), "trailing bytes after last box"
    return out


def parse_trun(payload: bytes):
    version = payload[0]
    flags = struct.unpack(">I", payload[:4])[0] & 0xFFFFFF
    assert version == 1 and flags == 0xF01
    n, data_offset = struct.unpack(">Ii", payload[4:12])
    rows = [struct.unpack(">IIIi", payload[12 + 16 * i:28 + 16 * i])
            for i in range(n)]
    return data_offset, rows


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_sps_parse_round_trip():
    for w, h in [(320, 176), (320, 180), (1920, 1080), (640, 360)]:
        got = h264.parse_sps(make_sps(w, h))
        assert (got["width"], got["height"]) == (w, h)
        assert got["profile"] == 66 and got["level"] == 30


def test_ts_demux_recovers_access_units():
    ts, expect = make_segment(n_frames=7)
    d = mpegts.TSDemuxer()
    d.feed(ts)
    units = d.finish()
    assert d.video_pid == 0x100
    assert len(units) == 7
    assert units[0].key and not units[1].key
    assert d.sps is not None and d.pps == PPS
    for u, (pts, dts, avcc) in zip(units, expect):
        assert (u.pts, u.dts) == (pts, dts)
        assert h264.annexb_to_avcc(u.nals) == avcc


def test_remux_box_structure(tmp_path):
    seg = tmp_path / "stream_000000.ts"
    ts, expect = make_segment(n_frames=10)
    seg.write_bytes(ts)
    out = tmp_path / "day.mp4"
    assert fmp4.remux_segments([seg], out) == 0
    boxes = walk_boxes(out.read_bytes())
    kinds = [k for k, _ in boxes]
    for required in (b"ftyp", b"moov", b"mvhd", b"trak", b"tkhd", b"mdia",
                     b"mdhd", b"hdlr", b"minf", b"stbl", b"stsd", b"mvex",
                     b"trex", b"moof", b"mfhd", b"traf", b"tfhd", b"tfdt",
                     b"trun", b"mdat"):
        assert required in kinds, f"missing {required!r}"
    # geometry from the SPS survives into tkhd (16.16 fixed point)
    tkhd = dict(boxes)[b"tkhd"]
    w16, h16 = struct.unpack(">II", tkhd[-8:])
    assert (w16 >> 16, h16 >> 16) == (320, 180)
    # trun rows describe exactly the mdat payload, sample by sample
    trun = dict(boxes)[b"trun"]
    mdat = dict(boxes)[b"mdat"]
    data_offset, rows = parse_trun(trun)
    assert len(rows) == 10
    assert sum(size for _, size, _, _ in rows) == len(mdat)
    assert rows[0][2] == fmp4.FLAG_KEY and rows[1][2] == fmp4.FLAG_NONKEY
    # AVCC payloads byte-identical to the source access units
    off = 0
    for (dur, size, _, cts), (pts, dts, avcc) in zip(rows, expect):
        assert mdat[off:off + size] == avcc
        assert dur == 3000 and cts == pts - dts
        off += size
    # data_offset points at the mdat payload (moof start + header)
    moof_start = out.read_bytes().find(b"moof") - 4
    blob = out.read_bytes()
    assert blob[moof_start + data_offset - 8:][:4] == struct.pack(
        ">I", len(mdat) + 8)


def test_remux_rebase_across_restarts(tmp_path):
    """Recorder respawns reset timestamps to ~0 (-avoid_negative_ts
    make_zero); the remuxer must keep the day's media time monotonic."""
    paths = []
    for i, t0 in enumerate([0, 30 * 90000, 0]):      # third segment resets
        p = tmp_path / f"stream_{i:06d}.ts"
        p.write_bytes(make_segment(n_frames=5, t0=t0, seq0=5 * i)[0])
        paths.append(p)
    out = tmp_path / "day.mp4"
    fmp4.remux_segments(paths, out)
    boxes = walk_boxes(out.read_bytes())
    tfdts = [struct.unpack(">Q", p[4:12])[0]
             for k, p in boxes if k == b"tfdt"]
    assert len(tfdts) == 3
    assert tfdts == sorted(tfdts), f"non-monotonic day timeline: {tfdts}"
    # each fragment spans 5 frames at 3000 ticks: the rebased third
    # fragment continues where the second ended
    assert tfdts[2] == tfdts[1] + 5 * 3000


def test_remux_skips_resolution_change(tmp_path):
    a = tmp_path / "a.ts"
    b = tmp_path / "b.ts"
    a.write_bytes(make_segment(width=320, height=180)[0])
    b.write_bytes(make_segment(width=640, height=360)[0])
    out = tmp_path / "day.mp4"
    assert fmp4.remux_segments([a, b], out) == 1      # one skipped
    walk_boxes(out.read_bytes())                      # still well-formed


def test_remux_no_video_raises(tmp_path):
    p = tmp_path / "junk.ts"
    p.write_bytes(b"\x47" + b"\x00" * 187)
    with pytest.raises(ValueError):
        fmp4.remux_segments([p], tmp_path / "day.mp4")


def test_day_mp4_endpoint(tmp_path):
    """GET /day.mp4 serves the remux with Range support; /download_day
    falls back to the same remux when ffmpeg is absent (this sandbox)."""
    import threading
    import urllib.request

    from clearcam_tpu.server.http import AppContext, serve
    from clearcam_tpu.utils.db import KVStore

    day = "2026-08-18"
    seg_dir = tmp_path / "cameras" / "gate" / "streams" / day
    seg_dir.mkdir(parents=True)
    (seg_dir / "stream_000000.ts").write_bytes(make_segment(n_frames=6)[0])

    ctx = AppContext(KVStore(tmp_path / "kv.db"), tmp_path)
    server = serve(ctx, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(
                f"{base}/day.mp4?cam=gate&day={day}") as r:
            blob = r.read()
            assert r.headers["Content-Type"] == "video/mp4"
        assert blob[4:8] == b"ftyp"
        walk_boxes(blob)
        # Range request (video seeking)
        req = urllib.request.Request(f"{base}/day.mp4?cam=gate&day={day}",
                                     headers={"Range": "bytes=4-7"})
        with urllib.request.urlopen(req) as r:
            assert r.status == 206
            assert r.read() == b"ftyp"
        # download_day without ffmpeg -> remux fallback
        with urllib.request.urlopen(
                f"{base}/download_day?cam_name=gate&day={day}") as r:
            assert r.read()[4:8] == b"ftyp"
        # bad day rejected
        req = urllib.request.Request(f"{base}/day.mp4?cam=gate&day=zz")
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_export_clip_remux_fallback(tmp_path, monkeypatch):
    """cloud/relay.export_clip with no ffmpeg produces a playable fMP4 of
    the recent segments instead of failing (reference requires ffmpeg,
    utils/helpers.py:133-200)."""
    from clearcam_tpu.cloud import relay

    monkeypatch.setattr(relay, "find_ffmpeg", lambda: None)
    seg = tmp_path / "stream_000000.ts"
    seg.write_bytes(make_segment(n_frames=6)[0])
    out = tmp_path / "clips" / "clip.mp4"
    assert relay.export_clip(tmp_path, out, length=1e9)
    walk_boxes(out.read_bytes())
    # the 240p relay segment is a re-encode: honestly unavailable
    assert not relay.export_clip(tmp_path, out, live=True)


def test_remux_skips_throwing_segment(tmp_path, monkeypatch):
    """A corrupt .ts whose PARSE RAISES (truncated PMT, bit-flipped SPS)
    must count as skipped like other undecodable segments — one bad file
    used to 500 /day.mp4 forever and kill /live.mp4 streams mid-read."""
    good = tmp_path / "a.ts"
    good.write_bytes(make_segment(n_frames=5)[0])
    bad = tmp_path / "b.ts"
    bad.write_bytes(make_segment(n_frames=5, t0=90000)[0])
    good2 = tmp_path / "c.ts"
    good2.write_bytes(make_segment(n_frames=5, t0=180000)[0])

    real = fmp4.mpegts.read_segment

    def flaky(path):
        if str(path).endswith("b.ts"):
            raise IndexError("truncated PMT")
        return real(path)

    monkeypatch.setattr(fmp4.mpegts, "read_segment", flaky)
    out = tmp_path / "day.mp4"
    skipped = fmp4.remux_segments([good, bad, good2], out)
    assert skipped == 1
    kinds = [k for k, _ in walk_boxes(out.read_bytes())]
    assert kinds.count(b"moof") == 2


def test_remux_cts_through_pts_wrap(tmp_path):
    """pts wraps at 2^33 while dts has not (B-frame reorder at the 26.5 h
    boundary): cts must come out as the small positive reorder delay, not
    ±2^33 (which overflowed the signed-32 trun pack with struct.error)."""
    wrap = 1 << 33
    seg = tmp_path / "w.ts"
    # dts just below the wrap; pts = dts + delay wraps past 2^33
    t0 = wrap - 2 * (90000 // 30)
    w = TSWriter()
    w.packets(0, pat(), True)
    w.packets(0x1000, pmt(), True)
    sps = make_sps(320, 180)
    for i in range(5):
        dts = (t0 + i * (90000 // 30)) % wrap
        pts = (dts + (90000 // 30)) % wrap
        nals = [sps, PPS, fake_slice(0x65, i)] if i == 0 \
            else [fake_slice(0x41, i)]
        w.packets(0x100, pes(annexb(*nals), pts, dts), True)
    seg.write_bytes(bytes(w.out))
    out = tmp_path / "w.mp4"
    assert fmp4.remux_segments([seg], out) == 0      # no struct.error
    data = out.read_bytes()
    # every trun cts row must be the one-frame reorder delay
    for kind, payload in walk_boxes(data):
        if kind != b"moof":
            continue
    # parse trun rows directly: locate 'trun' and read its sample rows
    i = data.find(b"trun")
    assert i > 0
    flags = int.from_bytes(data[i + 5:i + 8], "big")
    assert flags == 0xF01
    n = int.from_bytes(data[i + 8:i + 12], "big")
    rows = data[i + 16:i + 16 + 16 * n]
    for r in range(n):
        cts = int.from_bytes(rows[r * 16 + 12:r * 16 + 16], "big",
                             signed=True)
        assert cts == 90000 // 30, cts
