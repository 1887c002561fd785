"""Live zoo-URL validation (reference tests/configs/test_zoo_urls.py):
HEAD-resolve every resource URL in configs/zoo/*.yaml. Network-gated —
skips wholesale when the host has no egress (this build image has
none; tests/config/test_zoo.py covers the offline structure checks:
version/resources pairing, sha256 shape, converter round trip).

Run on a networked host with:  pytest tests/config/test_zoo_urls.py
"""

import os
import time

import pytest

from mmf_tpu.config.configuration import load_yaml
from mmf_tpu.utils.download import (
    DownloadableFile,
    check_header,
    has_network,
)

pytestmark = pytest.mark.skipif(
    not has_network(), reason="no network egress from this host"
)

# download source known-down in the reference's own CI
_SKIP_FILES = {"flickr30_images.tar.gz"}


def _iter_resources(node):
    if isinstance(node, list) and node and isinstance(node[0], dict) \
            and "url" in node[0]:
        for item in node:
            if item.get("file_name") in _SKIP_FILES:
                continue
            yield item
        return
    if isinstance(node, dict):
        for v in node.values():
            yield from _iter_resources(v)


def _zoo_resources(zoo_type):
    zoo = load_yaml(os.path.join("configs", "zoo", f"{zoo_type}.yaml"))
    return list(_iter_resources(zoo))


@pytest.mark.slow
@pytest.mark.parametrize("zoo_type", ["models", "datasets"])
def test_zoo_urls_resolve(zoo_type):
    failures = []
    for item in _zoo_resources(zoo_type):
        f = DownloadableFile(**item)
        from_google = "drive.google" in f.url
        for attempt in range(3):  # reference retries 3x with a sleep
            try:
                check_header(f.url, from_google=from_google)
                break
            except Exception as e:
                if attempt == 2:
                    failures.append(f"{f.url}: {type(e).__name__}: {e}")
                else:
                    time.sleep(2)
    assert not failures, (
        f"{len(failures)} zoo URLs failed to resolve:\n"
        + "\n".join(failures[:20])
    )


@pytest.mark.slow
def test_zoo_roundtrip_small_artifact(tmp_path, monkeypatch):
    """One real download -> convert -> load round trip on the smallest
    zoo model artifact (VERDICT r3 #7); requires network."""
    from mmf_tpu.utils.download import download_pretrained_model

    monkeypatch.setenv("MMF_DATA_DIR", str(tmp_path))
    path = download_pretrained_model("mmbt.hateful_memes.images")
    assert os.path.isdir(path) and os.listdir(path)
