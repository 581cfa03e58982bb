"""sync_data / compile / test_script_importing_module endpoints
(VERDICT r4 Missing #3: the 3 previously unaccounted L7 scripts).

sync_data is driven against a file:// mirror so the MANIFEST + md5
machinery (batch_sync_data.py:38-230) is tested for real without
network egress."""
import hashlib
import os
import subprocess
import sys

import numpy as np
import pytest

from xmipp3_tpu.programs import get_program


def _make_mirror(root, dataset="testXmipp"):
    d = root / dataset
    d.mkdir(parents=True)
    files = {"a.txt": b"hello", "sub/b.bin": bytes(range(64))}
    manifest = []
    for rel, payload in files.items():
        p = d / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(payload)
        manifest.append(f"{rel} {hashlib.md5(payload).hexdigest()}")
    (d / "MANIFEST").write_text("\n".join(manifest) + "\n")
    (root / "MANIFEST").write_text(f"./{dataset}\n")
    return files


def test_sync_data_download_and_update(tmp_path):
    mirror = tmp_path / "mirror"
    files = _make_mirror(mirror)
    url = mirror.as_uri()
    dest = tmp_path / "dest"

    prog = get_program("sync_data")
    rc = prog.run_with_args(["download", str(dest), url, "testXmipp"])
    assert rc == 0
    for rel, payload in files.items():
        assert (dest / rel).read_bytes() == payload

    # corrupt one file; update must restore it and leave the other alone
    (dest / "a.txt").write_bytes(b"corrupt")
    rc = get_program("sync_data").run_with_args(
        ["update", str(dest), url, "testXmipp"])
    assert rc == 0
    assert (dest / "a.txt").read_bytes() == b"hello"


def test_sync_data_unknown_dataset(tmp_path, capsys):
    mirror = tmp_path / "mirror"
    _make_mirror(mirror)
    rc = get_program("sync_data").run_with_args(
        ["download", str(tmp_path / "d"), mirror.as_uri(), "nope"])
    assert rc == 0
    assert "Unknown dataset" in capsys.readouterr().out


def test_sync_data_bad_md5(tmp_path):
    mirror = tmp_path / "mirror"
    _make_mirror(mirror)
    # tamper post-manifest: download must fail the md5 check
    (mirror / "testXmipp" / "a.txt").write_bytes(b"tampered")
    rc = get_program("sync_data").run_with_args(
        ["download", str(tmp_path / "d"), mirror.as_uri(), "testXmipp"])
    assert rc == 1


@pytest.mark.skipif(not os.path.exists("/usr/bin/g++") and
                    subprocess.run(["which", "g++"],
                                   capture_output=True).returncode != 0,
                    reason="no g++")
def test_compile_cpp(tmp_path, capsys):
    src = tmp_path / "hello.cpp"
    src.write_text('#include <cstdio>\n'
                   'int main(){ printf("42\\n"); return 0; }\n')
    prog = get_program("compile")
    rc = prog.run_with_args(["-i", str(src)])
    assert rc == 0
    out = subprocess.run([str(tmp_path / "hello")], capture_output=True,
                         text=True)
    assert out.stdout.strip() == "42"


def test_script_importing_module(capsys):
    prog = get_program("test_script_importing_module")
    rc = prog.run_with_args([])
    assert rc == 0
    cap = capsys.readouterr().out
    assert "returningFromFunction" in cap
    assert "returningFromFunction (II)" in cap
    assert "A class constant. (II)" in cap
    assert "[       OK ]" in cap
