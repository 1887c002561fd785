"""Shared constants (parity with mmf/common/constants.py)."""

IMAGE_COLOR_MEAN = (0.485, 0.456, 0.406)
IMAGE_COLOR_STD = (0.229, 0.224, 0.225)
INCEPTION_IMAGE_NORMALIZE = (0.5, 0.5, 0.5)

VISUAL_GENOME_CONSTS = {
    "synset_file": "vg_synsets.txt",
}

CLEVR_DOWNLOAD_URL = "https://dl.fbaipublicfiles.com/clevr/CLEVR_v1.0.zip"

DOWNLOAD_CHUNK_SIZE = 1024 * 1024
