"""Zoo resource-table validation + end-to-end zoo checkpoint load.

Mirrors the reference's ``tests/configs/test_zoo_urls.py`` structure
checks (every node pairs version with resources, every hashcode is a
valid sha256) without touching the network, and adds a fully-local
``download_pretrained_model`` -> ``load_pretrained_model`` ->
torch->flax converter round trip (VERDICT r1 item 3)."""

import hashlib
import os
import re
import tarfile

import numpy as np
import pytest

from mmf_tpu.config.configuration import get_zoo_config, load_yaml
from mmf_tpu.utils.download import DownloadableFile

SHA256_RE = re.compile(r"^[A-Fa-f0-9]{64}$")


def _iter_nodes(node):
    yield node
    if isinstance(node, dict):
        for v in node.values():
            yield from _iter_nodes(v)


def _zoo(zoo_type):
    return load_yaml(os.path.join("configs", "zoo", f"{zoo_type}.yaml"))


@pytest.mark.parametrize("zoo_type,min_hashes", [("models", 55), ("datasets", 50)])
def test_zoo_table_structure(zoo_type, min_hashes):
    zoo = _zoo(zoo_type)
    n_hashes = 0
    n_resources = 0
    for node in _iter_nodes(zoo):
        if not isinstance(node, dict):
            continue
        # version and resources always come as a pair
        assert ("version" in node) == ("resources" in node), node
        resources = node.get("resources", []) or []
        if isinstance(resources, dict):
            # dataset zoo: resources grouped by attribute
            # (features/images/annotations/extras)
            flat = []
            for group in resources.values():
                flat.extend(group or [])
            resources = flat
        for res in resources:
            n_resources += 1
            assert "url" in res and "file_name" in res, res
            hashcode = res.get("hashcode")
            if hashcode is not None:
                n_hashes += 1
                assert SHA256_RE.match(str(hashcode)), res["url"]
            # DownloadableFile must construct and resolve the mmf:// scheme
            d = DownloadableFile(**res)
            assert not d.url.startswith("mmf://")
            if res["url"].startswith("mmf://"):
                assert d.url.startswith("https://dl.fbaipublicfiles.com/mmf/data/")
    assert n_hashes >= min_hashes, f"only {n_hashes} hashed resources"
    assert n_resources >= n_hashes


@pytest.mark.parametrize(
    "key,variation,zoo_type",
    [
        ("visual_bert.pretrained.coco", "defaults", "models"),
        ("visual_bert.pretrained.coco", "full", "models"),
        ("visual_bert.finetuned.hateful_memes.from_coco", "defaults", "models"),
        ("vilbert.pretrained.cc", "defaults", "models"),
        ("mmbt.hateful_memes.images", "defaults", "models"),
        ("m4c.textvqa.with_stvqa", "defaults", "models"),
        ("m4c.textvqa", "alone", "models"),
        ("unit.all_8_datasets.shared_dec_with_coco_init", "defaults", "models"),
        ("unit", "defaults", "models"),
        ("hateful_memes.defaults", "defaults", "datasets"),
        ("vqa2.defaults", "defaults", "datasets"),
        ("textvqa.defaults", "defaults", "datasets"),
        ("coco.defaults", "defaults", "datasets"),
        ("stvqa.defaults", "defaults", "datasets"),
        ("okvqa.defaults", "defaults", "datasets"),
    ],
)
def test_known_zoo_keys_resolve(key, variation, zoo_type):
    version, resources = get_zoo_config(key, variation, None, zoo_type)
    assert isinstance(version, str) and "_20" in version, (key, version)
    assert resources and len(resources) >= 1
    if isinstance(resources, dict):
        flat = [r for group in resources.values() for r in (group or [])]
        assert flat, (key, resources)
        resources = flat
    assert all("url" in r for r in resources)


def test_zoo_versions_stay_strings():
    """The strict YAML loader must not parse 1.0_2020_05_19-style
    versions as numbers (PyYAML 1.1 would)."""
    from mmf_tpu.config.omega import yaml_load

    data = yaml_load("v: 1.0_2020_05_19\nd: 2020_05_08\nf: 1.5\ni: 42\n")
    assert data["v"] == "1.0_2020_05_19"
    assert data["d"] == "2020_05_08"
    assert data["f"] == 1.5 and isinstance(data["f"], float)
    assert data["i"] == 42 and isinstance(data["i"], int)


@pytest.fixture
def tiny_zoo(tmp_path, monkeypatch):
    """A local zoo: one model key whose resource is a tar.gz (torch ckpt +
    config.yaml) served by a patched ``download`` that copies from disk."""
    import torch

    from mmf_tpu.common.registry import registry
    from mmf_tpu.config import omega

    # payload: a tiny torch checkpoint + config
    payload = tmp_path / "payload"
    payload.mkdir()
    state = {"model": {"proj.weight": torch.ones(3, 2), "proj.bias": torch.zeros(3)}}
    torch.save(state, payload / "tiny_model.pth")
    (payload / "config.yaml").write_text("model_config:\n  tiny: {in_dim: 2}\n")
    archive = tmp_path / "tiny_model.tar.gz"
    with tarfile.open(archive, "w:gz") as tf:
        tf.add(payload / "tiny_model.pth", arcname="tiny_model.pth")
        tf.add(payload / "config.yaml", arcname="config.yaml")
    sha = hashlib.sha256(archive.read_bytes()).hexdigest()

    zoo_file = tmp_path / "models.yaml"
    zoo_file.write_text(
        "tiny_model:\n"
        "  defaults:\n"
        "    version: 1.0_2026_01_01\n"
        "    resources:\n"
        f"    - url: mmf://models/tiny_model/tiny_model.tar.gz\n"
        f"      file_name: tiny_model.tar.gz\n"
        f"      hashcode: {sha}\n"
    )

    data_dir = tmp_path / "data"
    cfg = omega.create(
        {"env": {"data_dir": str(data_dir), "model_zoo": str(zoo_file)}}
    )
    registry.register("config", cfg)

    import mmf_tpu.utils.download as download_mod

    def fake_download(url, path, fname, *a, **k):
        assert url.startswith("https://dl.fbaipublicfiles.com/mmf/data/")
        with open(os.path.join(path, fname), "wb") as f:
            f.write(archive.read_bytes())
        return True

    monkeypatch.setattr(download_mod, "download", fake_download)
    return {"sha": sha, "data_dir": data_dir, "archive": archive}


def test_download_pretrained_model_end_to_end(tiny_zoo):
    from mmf_tpu.utils.checkpoint import load_pretrained_model
    from mmf_tpu.utils.checkpoint_updater import convert_torch_state_dict
    from mmf_tpu.utils.download import download_pretrained_model

    path = download_pretrained_model("tiny_model")
    assert os.path.isdir(path)
    assert os.path.exists(os.path.join(path, "tiny_model.pth"))
    assert os.path.exists(os.path.join(path, "config.yaml"))

    # second call is a no-op (version marker present)
    assert download_pretrained_model("tiny_model") == path

    loaded = load_pretrained_model(path)
    assert loaded["config"]["model_config"]["tiny"]["in_dim"] == 2
    sd = loaded["checkpoint"]["model"]
    np.testing.assert_array_equal(np.asarray(sd["proj.weight"]), np.ones((3, 2)))

    # the converted state feeds the torch->flax converter
    template = {"proj": {"kernel": np.zeros((2, 3)), "bias": np.zeros(3)}}
    converted, stats = convert_torch_state_dict(
        {k: np.asarray(v) for k, v in sd.items()}, template
    )
    assert stats["shape_mismatch"] == 0
    np.testing.assert_array_equal(converted["proj"]["kernel"], np.ones((2, 3)))


def test_checksum_mismatch_raises(tiny_zoo, tmp_path):
    import mmf_tpu.utils.download as download_mod

    bad = DownloadableFile(
        url="mmf://models/tiny_model/tiny_model.tar.gz",
        file_name="tiny_model.tar.gz",
        hashcode="0" * 64,
    )
    dest = tmp_path / "bad"
    dest.mkdir()
    with pytest.raises(AssertionError):
        bad.download_file(str(dest))
