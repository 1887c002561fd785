"""Shared helpers for the offline feature-extraction scripts
(parity with tools/scripts/features/extraction_utils.py in the reference).
"""

from __future__ import annotations

import glob
import math
import os
from typing import Iterator, List, Optional, Sequence


def get_image_files(
    image_dir: str,
    exclude_list: Optional[str] = None,
    partition: Optional[int] = None,
    max_partition: Optional[int] = None,
    start_index: int = 0,
    end_index: Optional[int] = None,
    output_folder: Optional[str] = None,
) -> List[str]:
    """Collect the images to process: every png/jpg under ``image_dir``,
    minus an exclude list and anything already present in
    ``output_folder``, optionally sliced into one of ``max_partition``
    contiguous shards for multi-worker extraction."""
    files: set = set()
    for ext in ("*.png", "*.jpg", "*.jpeg"):
        files.update(glob.glob(os.path.join(image_dir, ext)))

    def stem(path: str) -> str:
        return os.path.basename(path).split(".")[0]

    skip: set = set()
    if exclude_list and os.path.exists(exclude_list):
        with open(exclude_list) as f:
            skip.update(line.strip().split(os.path.sep)[-1].split(".")[0]
                        for line in f if line.strip())
    if output_folder:
        skip.update(stem(p)
                    for p in glob.glob(os.path.join(output_folder, "*.npy")))

    selected = sorted(p for p in files if stem(p) not in skip)

    if partition is not None and max_partition is not None:
        interval = math.floor(len(selected) / max_partition)
        # the LAST shard (max_partition - 1) absorbs the remainder — the
        # old `== max_partition` check was unreachable, silently dropping
        # the tail images from every shard (reference extraction_utils)
        if partition == max_partition - 1:
            selected = selected[partition * interval:]
        else:
            selected = selected[partition * interval:
                                (partition + 1) * interval]

    if end_index is None:
        end_index = len(selected)
    return selected[start_index:end_index]


def chunks(array: Sequence, chunk_size: int) -> Iterator:
    """Yield successive fixed-size batches (last one may be short)."""
    for i in range(0, len(array), chunk_size):
        yield array[i:i + chunk_size], i
