"""Zoo download machinery (parity with mmf/utils/download.py).

``DownloadableFile`` (url + sha256 + optional google-drive handling),
versioned cache dirs with ``built``/``mark_done`` markers, decompression,
and ``download_pretrained_model`` keyed by the model zoo config.

Note: this build environment has zero network egress; downloads raise a
clear error at request time but the cache/marker/zoo-resolution logic is
fully functional against pre-populated cache dirs.
"""

from __future__ import annotations

import collections
import datetime
import hashlib
import json
import logging
import os
import shutil
import tarfile
import zipfile
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


class DownloadableFile:
    """One resource: url, target file name, optional sha256 checksum
    (reference download.py:31-160)."""

    # "mmf://" scheme used throughout the zoo tables resolves to the
    # public MMF CDN (reference download.py:56-57,98-101)
    MMF_PREFIX = "mmf://"
    MMF_PREFIX_REPLACEMENT = "https://dl.fbaipublicfiles.com/mmf/data/"

    def __init__(self, url, file_name, hashcode=None, compressed=True,
                 delete_original=False, dest_folder=None):
        if url.startswith(self.MMF_PREFIX):
            url = self.MMF_PREFIX_REPLACEMENT + url[len(self.MMF_PREFIX):]
        self._url = url
        self._file_name = file_name
        self._hashcode = hashcode
        self._compressed = compressed
        self._delete_original = delete_original
        self._dest_folder = dest_folder

    @property
    def file_name(self):
        return self._file_name

    @property
    def url(self):
        return self._url

    def checksum(self, download_path) -> bool:
        if self._hashcode is None:
            return True
        file_path = os.path.join(download_path, self._file_name)
        sha = hashlib.sha256()
        with open(file_path, "rb") as f:
            for chunk in iter(lambda: f.read(1024 * 1024), b""):
                sha.update(chunk)
        return sha.hexdigest() == self._hashcode

    def download_file(self, download_path):
        file_path = os.path.join(download_path, self._file_name)
        if os.path.exists(file_path) and self.checksum(download_path):
            logger.info(f"{self._file_name} already present and verified")
        else:
            # a present-but-corrupt file is re-fetched, not kept
            # (reference download.py:142-158 redownload-on-checksum-change)
            download(self._url, download_path, self._file_name,
                     redownload=os.path.exists(file_path))
            if not self.checksum(download_path):
                raise AssertionError(
                    f"Checksum of downloaded file {self._file_name} does not "
                    "match the expected checksum"
                )
        if self._compressed:
            decompress(download_path, self._file_name,
                       delete_original=self._delete_original)


def check_header(url: str, from_google: bool = False,
                 timeout: float = 10.0) -> None:
    """HEAD-resolve ``url`` and assert it answers 200 (reference
    download.py:check_header — the zoo-URL CI gate). Google-Drive URLs
    are probed with a ranged GET since Drive rejects HEAD."""
    import urllib.request

    if from_google:
        req = urllib.request.Request(
            url, headers={"Range": "bytes=0-0",
                          "User-Agent": "mmf_tpu-zoo-check"}
        )
    else:
        req = urllib.request.Request(
            url, method="HEAD",
            headers={"User-Agent": "mmf_tpu-zoo-check"},
        )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        status = getattr(resp, "status", resp.getcode())
        assert status in (200, 206), (
            f"url {url} answered HTTP {status}"
        )


def has_network(timeout: float = 5.0) -> bool:
    """True when this host can resolve + TCP-connect to the MMF CDN —
    the gate tests/config/test_zoo_urls.py skips on (this image has no
    egress; a plain socket probe avoids conflating HTTP-level errors
    with connectivity)."""
    import socket

    try:
        with socket.create_connection(
            ("dl.fbaipublicfiles.com", 443), timeout=timeout
        ):
            return True
    except OSError:
        return False


def download(url: str, path: str, fname: str, redownload: bool = False) -> bool:
    """Fetch a url to path/fname. This image has no egress: surface a
    precise, actionable error instead of hanging."""
    os.makedirs(path, exist_ok=True)
    outfile = os.path.join(path, fname)
    if os.path.isfile(outfile) and not redownload:
        return True
    import urllib.error
    import urllib.request

    try:
        logger.info(f"Downloading {url} to {outfile}")
        urllib.request.urlretrieve(url, outfile)  # nosec - zoo URLs from config
        return True
    except (urllib.error.URLError, OSError) as e:
        raise RuntimeError(
            f"Could not download {url} (this environment may have no network "
            f"egress). Pre-populate the cache at {outfile} instead."
        ) from e


def decompress(path: str, fname: str, delete_original: bool = True):
    fullpath = os.path.join(path, fname)
    if tarfile.is_tarfile(fullpath):
        with tarfile.open(fullpath) as tf:
            tf.extractall(path=path, filter="data")
    elif zipfile.is_zipfile(fullpath):
        with zipfile.ZipFile(fullpath) as zf:
            zf.extractall(path=path)
    else:
        return
    if delete_original:
        os.remove(fullpath)


def built(path: str, version_string: Optional[str] = None) -> bool:
    """Check the build-completion marker (reference download.py:168-192)."""
    fname = os.path.join(path, ".built")
    if not os.path.isfile(fname):
        return False
    if version_string:
        with open(fname) as f:
            content = f.read().split("\n")
        return len(content) > 1 and content[1] == version_string
    return True


def mark_done(path: str, version_string: Optional[str] = None):
    """Write the marker recording build time + version
    (reference download.py:195-208)."""
    with open(os.path.join(path, ".built"), "w") as f:
        f.write(str(datetime.datetime.today()))
        if version_string:
            f.write("\n" + str(version_string))


def download_pretrained_model(model_name: str, *args, **kwargs) -> str:
    """Resolve a zoo key to a versioned cache dir, downloading resources if
    needed (reference download.py:336-383)."""
    from mmf_tpu.config.configuration import (
        get_mmf_env,
        get_zoo_config,
    )

    model_zoo = get_mmf_env(key="model_zoo")
    version, resources = get_zoo_config(model_name, "defaults", model_zoo,
                                        "models")
    if version is None:
        version = "1.0"
    if resources is None:
        raise RuntimeError(f"Model name {model_name} doesn't specify any resources")

    data_dir = get_mmf_env(key="data_dir")
    download_path = os.path.join(data_dir, "models", model_name)
    os.makedirs(download_path, exist_ok=True)

    if built(download_path, version):
        return download_path

    for resource in resources:
        if isinstance(resource, dict):
            obj = DownloadableFile(**resource)
        else:
            obj = DownloadableFile(resource, resource.split("/")[-1])
        obj.download_file(download_path)
    mark_done(download_path, version)
    return download_path


def download_resources(resources, download_path, version):
    os.makedirs(download_path, exist_ok=True)
    if not built(download_path, version):
        for resource in resources:
            download_resource(resource, download_path)
        mark_done(download_path, version)


def download_resource(resource, download_path):
    if isinstance(resource, collections.abc.Mapping):
        resource = DownloadableFile(**resource)
    assert isinstance(resource, DownloadableFile)
    resource.download_file(download_path)
