"""Native components: AES-NI CBC vs the Python paths, and the C++ frame
batcher (push path, fd reader path, seqlock snapshot)."""
import os
import time

import numpy as np
import pytest

from clearcam_tpu.cloud import crypto
from clearcam_tpu.runtime import native_loader


def _native_available():
    return native_loader.aes_lib() is not None


@pytest.mark.skipif(not _native_available(), reason="native build unavailable")
def test_native_aes_selftest_and_parity():
    key = crypto.prepare_key("secret")
    iv = bytes(range(16))
    data = os.urandom(64)
    native = native_loader.aes_cbc(key, iv, data, True)
    pure = crypto._cbc_pure(key, iv, data, True)
    assert native == pure
    back = native_loader.aes_cbc(key, iv, native, False)
    assert back == data


def test_encrypt_roundtrip_file_format(tmp_path):
    """Full file format (IV || CBC(magic||data)), whichever backend is active.
    Matches the mobile apps' decrypt expectations (VideoHelper.kt:311)."""
    src = tmp_path / "clip.mp4"
    src.write_bytes(os.urandom(1000) + b"tail")
    enc = tmp_path / "clip.mp4.aes"
    assert crypto.encrypt_file(src, enc, "mykey")
    blob = enc.read_bytes()
    assert len(blob) % 16 == 0 and blob[:16] != src.read_bytes()[:16]
    out = tmp_path / "clip_dec.mp4"
    assert crypto.decrypt_file(enc, out, "mykey")
    assert out.read_bytes() == src.read_bytes()
    # wrong key fails the magic check
    assert not crypto.decrypt_file(enc, out, "wrong")


def test_wire_format_stable():
    """Byte-exact format check with fixed IV so mobile decrypt stays valid."""
    blob = crypto.encrypt_bytes(b"hello", "k", iv=bytes(16))
    assert blob[:16] == bytes(16)
    assert crypto.decrypt_bytes(blob, "k") == b"hello"
    # PKCS7 + 8-byte magic header: 5 + 8 -> padded to 16
    assert len(blob) == 16 + 16


@pytest.mark.skipif(native_loader.load_lib("ccingest") is None,
                    reason="native build unavailable")
def test_batcher_push_and_snapshot():
    b = native_loader.NativeBatcher(3, (4, 6, 3))
    frame0 = np.full((4, 6, 3), 7, np.uint8)
    frame2 = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    b.push(0, frame0)
    b.push(2, frame2)
    b.push(2, frame2 * 2)
    batch, seqs = b.snapshot()
    assert seqs.tolist() == [0, -1, 1]
    np.testing.assert_array_equal(batch[0], frame0)
    np.testing.assert_array_equal(batch[2], frame2 * 2)
    b.close()


@pytest.mark.skipif(native_loader.load_lib("ccingest") is None,
                    reason="native build unavailable")
def test_batcher_fd_reader():
    """Native reader thread consumes a pipe of raw frames (the ffmpeg
    rawvideo-stdout shape) without any Python pump."""
    shape = (8, 8, 3)
    n = int(np.prod(shape))
    b = native_loader.NativeBatcher(1, shape)
    r, w = os.pipe()
    b.add_fd(0, r)
    for val in (1, 2, 3):
        os.write(w, bytes([val]) * n)
    deadline = time.time() + 5
    while time.time() < deadline:
        batch, seqs = b.snapshot()
        if seqs[0] >= 2:
            break
        time.sleep(0.01)
    assert seqs[0] >= 2
    assert batch[0, 0, 0, 0] == 3
    os.close(w)
    b.close()


@pytest.mark.skipif(native_loader.load_lib("ccingest") is None,
                    reason="native build unavailable")
def test_batcher_slot_reuse_after_eof():
    """A stream whose pipe hit EOF can be re-attached to the same slot
    (camera respawn path)."""
    shape = (4, 4, 3)
    n = int(np.prod(shape))
    b = native_loader.NativeBatcher(1, shape)
    r, w = os.pipe()
    b.add_fd(0, r)
    os.write(w, bytes([9]) * n)
    os.close(w)                      # EOF stops the reader
    deadline = time.time() + 5
    while time.time() < deadline:
        _, seqs = b.snapshot()
        if seqs[0] == 0:
            break
        time.sleep(0.01)
    time.sleep(0.1)                  # let the reader exit
    r2, w2 = os.pipe()
    b.add_fd(0, r2)                  # reuse slot 0
    os.write(w2, bytes([5]) * n)
    deadline = time.time() + 5
    while time.time() < deadline:
        batch, seqs = b.snapshot()
        if seqs[0] >= 1:
            break
        time.sleep(0.01)
    assert seqs[0] >= 1 and batch[0, 0, 0, 0] == 5
    os.close(w2)
    b.close()


@pytest.mark.skipif(native_loader.load_lib("ccingest") is None,
                    reason="native build unavailable")
def test_batcher_remove_frees_slot():
    """cc_batcher_remove stops the reader, resets seq, and lets a different
    camera take the slot without inheriting the old camera's last frame."""
    shape = (4, 4, 3)
    n = int(np.prod(shape))
    b = native_loader.NativeBatcher(1, shape)
    r, w = os.pipe()
    b.add_fd(0, r)
    os.write(w, bytes([9]) * n)
    deadline = time.time() + 5
    while time.time() < deadline:
        _, seqs = b.snapshot()
        if seqs[0] == 0:
            break
        time.sleep(0.01)
    os.close(w)
    b.remove(0)
    _, seqs = b.snapshot()
    assert seqs[0] == -1            # stale frame no longer visible
    r2, w2 = os.pipe()
    b.add_fd(0, r2)                 # new camera takes the freed slot
    os.write(w2, bytes([3]) * n)
    deadline = time.time() + 5
    while time.time() < deadline:
        batch, seqs = b.snapshot()
        if seqs[0] >= 0:
            break
        time.sleep(0.01)
    assert seqs[0] >= 0 and batch[0, 0, 0, 0] == 3
    os.close(w2)
    b.close()


@pytest.mark.skipif(native_loader.load_lib("ccingest") is None,
                    reason="native build unavailable")
def test_ingest_respawn_cycling_beyond_group_cap():
    """100 register/remove cycles with changing shapes never exhaust
    GROUP_CAP (the round-1 slot leak: reference tolerates unlimited
    re-points, clearcam.py:255-268)."""
    from clearcam_tpu.runtime.nvr import NativeIngest

    ing = NativeIngest()
    shapes = [(4, 4, 3), (4, 6, 3)]
    writers = []
    try:
        for i in range(100):
            shape = shapes[i % 2]   # alternate resolutions: cross-group moves
            r, w = os.pipe()
            writers.append(w)
            key, idx = ing.register("cam_a", r, shape)
            assert idx < NativeIngest.PAGE_CAP
            os.write(w, bytes([i % 251 + 1]) * int(np.prod(shape)))
            os.close(w)             # EOF so the next register can reuse
            ing.remove("cam_a")
        # after all cycles every page is fully freed and only one page exists
        for pages in ing.groups.values():
            assert len(pages) == 1
            assert sum(1 for nm in pages[0]["names"] if nm is not None) == 0
        # a fresh registration still works and lands in a reclaimed slot
        r, w = os.pipe()
        _, idx = ing.register("cam_b", r, shapes[0])
        assert idx == 0
        os.write(w, bytes([7]) * int(np.prod(shapes[0])))
        deadline = time.time() + 5
        while time.time() < deadline:
            snap = ing.snapshot_all()
            if "cam_b" in snap and snap["cam_b"][1] >= 0:
                break
            time.sleep(0.01)
        frame, seq = snap["cam_b"]
        assert seq >= 0 and frame[0, 0, 0] == 7
        os.close(w)
    finally:
        ing.close()


REPLAYER = native_loader.NATIVE_DIR / "build" / "pjrt_replayer"
AXON_PLUGIN = "/opt/axon/libaxon_pjrt.so"


@pytest.mark.skipif(
    not (REPLAYER.exists() and os.path.exists(AXON_PLUGIN)
         and os.environ.get("CLEARCAM_REPLAYER_TPU_TEST")),
    reason="needs built replayer + axon plugin + CLEARCAM_REPLAYER_TPU_TEST=1 "
           "(claims a TPU session; run explicitly, see tools/replayer_check.sh)")
def test_pjrt_replayer_run_numeric_parity(tmp_path):
    """The C++ replayer compiles an exported program through the PJRT C API
    on the real TPU and its output matches JAX's (Yolo.m:26-196 equivalent)."""
    import subprocess
    import sys

    gen = subprocess.run(
        [sys.executable, "-c", (
            "import os; os.environ['JAX_PLATFORMS']='cpu';"
            "import numpy as np, jax, jax.numpy as jnp;"
            "jax.config.update('jax_platforms','cpu');"
            "from jax import export as jexport;"
            "fn=lambda x: jnp.cumsum(x.astype(jnp.float32))*0.5;"
            "e=jexport.export(jax.jit(fn))(jax.ShapeDtypeStruct((16,),jnp.uint8));"
            f"open(r'{tmp_path}/p.mlir','w').write(e.mlir_module());"
            f"np.arange(16,dtype=np.uint8).tofile(r'{tmp_path}/in.bin');"
            "np.save(r'%s/ref.npy', np.asarray(fn(jnp.arange(16,dtype=jnp.uint8))))"
            % tmp_path)],
        capture_output=True, text=True)
    assert gen.returncode == 0, gen.stderr
    env = dict(os.environ, AXON_POOL_SVC_OVERRIDE="127.0.0.1",
               AXON_LOOPBACK_RELAY="1", TPU_WORKER_HOSTNAMES="localhost")
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [str(REPLAYER), "run", "p.mlir", "in.bin", AXON_PLUGIN,
         "remote_compile=1", "local_only=0", "priority=0",
         "topology=v5e:1x1x1", "n_slices=1", "rank=4294967295",
         f"session_id=replayer-pytest-{os.getpid()}"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=560)
    assert r.returncode == 0, r.stdout + r.stderr
    got = np.fromfile(tmp_path / "replayer_out0.bin", np.float32)
    ref = np.load(tmp_path / "ref.npy")
    np.testing.assert_allclose(got, ref)


@pytest.mark.skipif(native_loader.load_lib("ccingest") is None,
                    reason="native build unavailable")
def test_batcher_ingest_downsample():
    """k=3 decimation in the C++ reader equals the letterbox fast path's
    center pixel tap (frames published at [H/3, W/3, 3]) — via both push
    and the pipe-reader path."""
    rng = np.random.default_rng(0)
    full = rng.integers(0, 255, (9, 12, 3), np.uint8)
    expect = full[1::3, 1::3, :]                 # offset (k-1)/2 = 1, step 3

    b = native_loader.NativeBatcher(1, (9, 12, 3), downsample=3)
    assert b.shape == (3, 4, 3)
    b.push(0, full)
    batch, seqs = b.snapshot()
    assert seqs[0] == 0
    np.testing.assert_array_equal(batch[0], expect)
    b.close()

    b = native_loader.NativeBatcher(1, (9, 12, 3), downsample=3)
    r, w = os.pipe()
    b.add_fd(0, r)
    os.write(w, full.tobytes())
    deadline = time.time() + 5
    while time.time() < deadline:
        batch, seqs = b.snapshot()
        if seqs[0] >= 0:
            break
        time.sleep(0.01)
    np.testing.assert_array_equal(batch[0], expect)
    os.close(w)
    b.close()
    # invalid factors rejected (even k, non-divisible dims)
    with pytest.raises(ValueError):
        native_loader.NativeBatcher(1, (8, 12, 3), downsample=2)
    with pytest.raises(ValueError):
        native_loader.NativeBatcher(1, (10, 12, 3), downsample=3)


@pytest.mark.skipif(native_loader.load_lib("ccingest") is None,
                    reason="native build unavailable")
def test_ingest_pages_beyond_cap():
    """More same-resolution cameras than one page: the group grows by
    allocating another batcher page instead of raising (the 130-stream
    bench claim needs >32 cameras of one resolution)."""
    from clearcam_tpu.runtime.nvr import NativeIngest

    ing = NativeIngest()
    shape = (4, 4, 3)
    n = int(np.prod(shape))
    writers = []
    try:
        for i in range(NativeIngest.PAGE_CAP + 3):
            r, w = os.pipe()
            writers.append(w)
            ing.register(f"cam{i:03d}", r, shape)
            os.write(w, bytes([i % 251 + 1]) * n)
        assert len(ing.groups[shape]) == 2
        deadline = time.time() + 5
        while time.time() < deadline:
            snap = ing.snapshot_all()
            if len(snap) == NativeIngest.PAGE_CAP + 3 and \
                    all(seq >= 0 for _, seq in snap.values()):
                break
            time.sleep(0.01)
        assert len(snap) == NativeIngest.PAGE_CAP + 3
        for i in range(NativeIngest.PAGE_CAP + 3):
            frame, seq = snap[f"cam{i:03d}"]
            assert seq >= 0 and frame[0, 0, 0] == i % 251 + 1
    finally:
        for w in writers:
            try:
                os.close(w)
            except OSError:
                pass
        ing.close()


@pytest.mark.skipif(native_loader.load_lib("ccingest") is None,
                    reason="native build unavailable")
def test_batcher_snapshot_never_torn():
    """Hammer a slot from a writer thread while snapshotting: every accepted
    frame must be internally uniform (the seqlock torn-read fix)."""
    import threading

    shape = (32, 32, 3)
    b = native_loader.NativeBatcher(1, shape)
    stop = threading.Event()

    def writer():
        i = 0
        buf = np.empty(shape, np.uint8)
        while not stop.is_set():
            buf.fill(i % 251)
            b.push(0, buf)
            i += 1

    t = threading.Thread(target=writer, daemon=True)
    t.start()
    try:
        deadline = time.time() + 2
        while time.time() < deadline:
            batch, seqs = b.snapshot()
            if seqs[0] < 0:
                continue
            flat = batch[0].reshape(-1)
            assert (flat == flat[0]).all(), "torn snapshot"
    finally:
        stop.set()
        t.join()
        b.close()
