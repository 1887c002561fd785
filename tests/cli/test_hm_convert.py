"""mmf_convert_hm end-to-end: synthetic Hateful Memes zips (phase 1 and
phase 2, data/-nested and root layouts) -> framework dir layout
(reference surface: mmf_cli/hm_convert.py)."""

import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _make_zip(path, phase, nested):
    root = "data/" if nested else ""
    with zipfile.ZipFile(path, "w") as zf:
        names = (["train.jsonl", "dev_seen.jsonl", "test_seen.jsonl",
                  "dev_unseen.jsonl", "test_unseen.jsonl"] if phase == 2
                 else ["train.jsonl", "dev.jsonl", "test.jsonl"])
        for n in names:
            zf.writestr(root + n, json.dumps(
                {"id": 1, "img": "img/1.png", "text": "hello", "label": 0}
            ) + "\n")
        zf.writestr(root + "img/1.png", b"\x89PNG fakedata")


def _run(zip_path, out_dir):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    proc = subprocess.run(
        [sys.executable, "-m", "mmf_tpu.cli.hm_convert",
         "--zip_file", str(zip_path), "--output_dir", str(out_dir),
         "--bypass_checksum"],
        capture_output=True, text=True, timeout=120, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def test_hm_convert_phase2_nested(tmp_path):
    zp = tmp_path / "hm.zip"
    _make_zip(zp, phase=2, nested=True)
    out = tmp_path / "out"
    stdout = _run(zp, out)
    assert "phase 2" in stdout
    ann = out / "annotations"
    for f in ("train.jsonl", "dev_seen.jsonl", "dev_unseen.jsonl",
              "test_seen.jsonl", "test_unseen.jsonl"):
        assert (ann / f).exists(), f
    assert (out / "images" / "img" / "1.png").exists()
    assert not (out / "_extract").exists(), "temp extract dir cleaned up"


def test_hm_convert_phase1_root_layout(tmp_path):
    zp = tmp_path / "hm1.zip"
    _make_zip(zp, phase=1, nested=False)
    out = tmp_path / "out1"
    stdout = _run(zp, out)
    assert "phase 1" in stdout
    for f in ("train.jsonl", "dev.jsonl", "test.jsonl"):
        assert (out / "annotations" / f).exists(), f
    entry = json.loads((out / "annotations" / "train.jsonl").read_text())
    assert entry["text"] == "hello"
