"""Download/zoo machinery without network: DownloadableFile checksum +
mmf:// rewriting, decompress, built/mark_done version markers, and
download_pretrained_model against a pre-populated cache (behavioral
coverage mirroring the reference tests/utils/test_download.py)."""

import hashlib
import os
import tarfile
import zipfile

import pytest

from mmf_tpu.utils import download as dl


def _write(path, data=b"hello mmf"):
    with open(path, "wb") as f:
        f.write(data)
    return hashlib.sha256(data).hexdigest()


def test_downloadable_file_mmf_prefix_rewrite():
    f = dl.DownloadableFile("mmf://some/model.pth", "model.pth")
    assert f.url == "https://dl.fbaipublicfiles.com/mmf/data/some/model.pth"
    assert f.file_name == "model.pth"


def test_checksum_pass_and_fail(tmp_path):
    good = _write(os.path.join(str(tmp_path), "f.bin"))
    f = dl.DownloadableFile("mmf://x/f.bin", "f.bin", hashcode=good)
    assert f.checksum(str(tmp_path))
    f_bad = dl.DownloadableFile("mmf://x/f.bin", "f.bin", hashcode="0" * 64)
    assert not f_bad.checksum(str(tmp_path))
    # no hashcode -> vacuously true
    f_none = dl.DownloadableFile("mmf://x/f.bin", "f.bin")
    assert f_none.checksum(str(tmp_path))


def test_download_file_uses_existing_verified_copy(tmp_path):
    """A present, checksum-verified file must not hit the network."""
    good = _write(os.path.join(str(tmp_path), "f.bin"))
    f = dl.DownloadableFile(
        "mmf://x/f.bin", "f.bin", hashcode=good, compressed=False
    )
    f.download_file(str(tmp_path))  # would raise if it tried to download


def test_download_file_checksum_mismatch_redownloads_and_errors(tmp_path):
    _write(os.path.join(str(tmp_path), "f.bin"))
    f = dl.DownloadableFile(
        "mmf://x/f.bin", "f.bin", hashcode="0" * 64, compressed=False
    )
    with pytest.raises(RuntimeError, match="no network|Could not download"):
        f.download_file(str(tmp_path))


def test_decompress_tar_and_zip(tmp_path):
    inner = os.path.join(str(tmp_path), "inner.txt")
    _write(inner, b"payload")

    tar_path = os.path.join(str(tmp_path), "a.tar.gz")
    with tarfile.open(tar_path, "w:gz") as tf:
        tf.add(inner, arcname="from_tar.txt")
    dl.decompress(str(tmp_path), "a.tar.gz")
    assert os.path.exists(os.path.join(str(tmp_path), "from_tar.txt"))
    assert not os.path.exists(tar_path)  # delete_original default

    zip_path = os.path.join(str(tmp_path), "b.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        zf.write(inner, arcname="from_zip.txt")
    dl.decompress(str(tmp_path), "b.zip", delete_original=False)
    assert os.path.exists(os.path.join(str(tmp_path), "from_zip.txt"))
    assert os.path.exists(zip_path)

    # non-archives are left alone
    dl.decompress(str(tmp_path), "inner.txt")
    assert os.path.exists(inner)


def test_built_and_mark_done_versioning(tmp_path):
    path = str(tmp_path)
    assert not dl.built(path)
    dl.mark_done(path, version_string="1.0")
    assert dl.built(path)
    assert dl.built(path, version_string="1.0")
    assert not dl.built(path, version_string="2.0")
    # unversioned marker fails any version check
    dl.mark_done(path)
    assert dl.built(path)
    assert not dl.built(path, version_string="1.0")


def test_download_pretrained_model_prepopulated_cache(tmp_path, monkeypatch):
    """A zoo key resolves to its versioned cache dir without network when
    the cache is built (the reference short-circuit download.py:361-364)."""
    from mmf_tpu.config import configuration as conf

    zoo_dir = tmp_path / "zoo"
    data_dir = tmp_path / "data"
    zoo_dir.mkdir()
    (zoo_dir / "models.yaml").write_text(
        "toy:\n"
        "  defaults: ${toy.v1}\n"
        "  v1:\n"
        "    version: v1\n"
        "    resources:\n"
        "      - url: mmf://toy/model.pth\n"
        "        file_name: model.pth\n"
        "        hashcode: null\n"
    )
    monkeypatch.setattr(
        conf,
        "get_mmf_env",
        lambda key=None: {
            "model_zoo": str(zoo_dir / "models.yaml"),
            "data_dir": str(data_dir),
        }[key],
    )

    cache = data_dir / "models" / "toy"
    cache.mkdir(parents=True)
    _write(str(cache / "model.pth"))
    dl.mark_done(str(cache), version_string="v1")

    path = dl.download_pretrained_model("toy")
    assert path == str(cache)

    # stale version marker -> must try to (re)download -> clear error here
    dl.mark_done(str(cache), version_string="v0")
    os.remove(str(cache / "model.pth"))
    with pytest.raises(RuntimeError, match="no network|Could not download"):
        dl.download_pretrained_model("toy")


def test_download_pretrained_model_unknown_key_raises(tmp_path, monkeypatch):
    from mmf_tpu.config import configuration as conf

    zoo_file = tmp_path / "models.yaml"
    zoo_file.write_text("toy:\n  version: v1\n  resources: []\n")
    monkeypatch.setattr(
        conf,
        "get_mmf_env",
        lambda key=None: {
            "model_zoo": str(zoo_file),
            "data_dir": str(tmp_path),
        }[key],
    )
    with pytest.raises(RuntimeError, match="resources"):
        dl.download_pretrained_model("missing_key")
