"""Multi-host (DCN) federation.

Device layer: a REAL 2-process jax.distributed run (Gloo collectives over
localhost = the DCN stand-in, 2 virtual CPU devices per process) builds the
global mesh, feeds per-host camera batches, runs the sharded detect step,
and each host reads back only its own cameras' rows.

Service layer: a primary HTTP server + a FederationPeer registering over
real sockets; merged inventory; stale peer eviction.
"""
import json
import socket
import subprocess
import sys
import textwrap
import time
import urllib.request
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent("""
    import os, sys
    pid, port = int(sys.argv[1]), sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, %r)
    from clearcam_tpu.utils import jaxcache
    jax.config.update("jax_compilation_cache_dir", jaxcache.cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np
    from clearcam_tpu.parallel import federation as fed

    fed.init_distributed(f"127.0.0.1:{port}", num_processes=2, process_id=pid,
                         local_device_ids=[0, 1])
    assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2
    mesh = fed.make_global_mesh(model=1)
    assert mesh.shape == {"data": 4, "model": 1}

    # each "NVR host" contributes 2 local cameras' frames
    from clearcam_tpu.models import yolov9
    params = yolov9.init_params("t", seed=0)
    rng = np.random.default_rng(pid)
    local = rng.integers(0, 255, (2, 96, 128, 3), np.uint8)
    with mesh:
        gbatch = fed.host_batch_to_global(mesh, local)
        assert gbatch.shape[0] == 4          # 2 hosts x 2 cameras
        det, _ = fed.global_detect_step(mesh, "t", res=64)
        out = det(params, gbatch)
        mine = fed.fetch_local(out)
    # parity: this host's rows == single-process detect on its own frames
    import jax.numpy as jnp
    solo = np.asarray(jax.jit(
        lambda p, f: yolov9.detect(p, f, size="t", res=64))(params, local))
    np.testing.assert_allclose(mine, solo, rtol=2e-4, atol=2e-4)
    print(f"proc {pid} OK rows={mine.shape}", flush=True)
""" % str(REPO))


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_dcn_detect():
    port = free_port()
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i} OK" in out


# ---------------------------------------------------------------------------
# service layer
# ---------------------------------------------------------------------------

@pytest.fixture
def primary(tmp_path):
    from clearcam_tpu.runtime.settings import GlobalSettings
    from clearcam_tpu.server.http import AppContext, serve
    from clearcam_tpu.utils.db import KVStore

    db = KVStore(tmp_path / "kv.db")
    db.run_put("links", "localcam", "rtsp://local")
    ctx = AppContext(db, tmp_path / "data", settings=GlobalSettings())
    server = serve(ctx, port=0)
    yield f"http://127.0.0.1:{server.server_address[1]}", ctx
    server.shutdown()


def jget(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def test_peer_registration_and_merged_inventory(primary):
    from clearcam_tpu.cloud.federation import FederationPeer

    url, ctx = primary
    peer = FederationPeer(url, "http://10.9.8.7:8080",
                          lambda: ["gate", "yard"])
    assert peer.register_once()
    cams = jget(f"{url}/federation/cameras")
    by_cam = {c["cam"]: c for c in cams}
    assert by_cam["localcam"]["host"] == ""            # primary's own camera
    assert by_cam["gate"]["host"] == "http://10.9.8.7:8080"
    assert by_cam["yard"]["url"] == "http://10.9.8.7:8080/?cam=yard"


def test_stale_peer_eviction(primary):
    url, ctx = primary
    ctx.federation.stale_s = 0.2
    ctx.federation.register("http://peer-a:8080", ["a"])
    assert any(c["cam"] == "a" for c in jget(f"{url}/federation/cameras"))
    time.sleep(0.3)
    assert not any(c["cam"] == "a" for c in jget(f"{url}/federation/cameras"))


def test_register_validates_host(primary):
    url, _ = primary
    req = urllib.request.Request(
        f"{url}/federation/register",
        data=json.dumps({"host": "javascript:alert(1)",
                         "cameras": ["x"]}).encode(), method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 400


def test_background_registration_loop(primary):
    from clearcam_tpu.cloud.federation import FederationPeer

    url, ctx = primary
    peer = FederationPeer(url, "http://10.0.0.3:8080", lambda: ["cam3"],
                          interval=0.1).start()
    deadline = time.time() + 5
    while time.time() < deadline:
        if any(c["cam"] == "cam3" for c in jget(f"{url}/federation/cameras")):
            break
        time.sleep(0.05)
    peer.stop()
    assert any(c["cam"] == "cam3" for c in jget(f"{url}/federation/cameras"))
