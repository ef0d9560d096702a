"""clip_cli tool: decrypt round-trip + model-file inspection.

The decrypt subcommand is the ccviewer/mobile-side operation on the wire
format the reference's apps consume (helpers.py:336-355 AES-CBC, magic
0x4D41474943); inspect lists tensors of the weight formats the loaders
read."""
import numpy as np
import pytest

from clearcam_tpu.cloud.crypto import encrypt_file
from clearcam_tpu.io import safetensors as st
from clearcam_tpu.tools.clip_cli import main


def test_decrypt_roundtrip(tmp_path, capsys):
    src = tmp_path / "clip.mp4"
    src.write_bytes(b"\x00\x00\x00\x18ftypmp42" + bytes(range(256)) * 8)
    enc = tmp_path / "clip.mp4.aes"
    assert encrypt_file(src, enc, "sekrit")
    out = tmp_path / "out.mp4"
    with pytest.raises(SystemExit) as e:
        main(["decrypt", str(enc), str(out), "--key", "sekrit"])
    assert e.value.code == 0
    assert out.read_bytes() == src.read_bytes()
    assert "ok" in capsys.readouterr().out


def test_decrypt_wrong_key_fails(tmp_path):
    src = tmp_path / "clip.mp4"
    src.write_bytes(b"payload")
    enc = tmp_path / "clip.mp4.aes"
    assert encrypt_file(src, enc, "right")
    with pytest.raises(SystemExit) as e:
        main(["decrypt", str(enc), str(tmp_path / "out.mp4"), "--key", "wrong"])
    assert e.value.code == 1


def test_inspect_safetensors(tmp_path, capsys):
    p = tmp_path / "w.safetensors"
    st.save({"tower.w": np.zeros((3, 4), np.float32),
             "tower.b": np.ones((4,), np.float32)}, p)
    main(["inspect", str(p)])
    out = capsys.readouterr().out
    assert "tower.w" in out and "2 tensors" in out
