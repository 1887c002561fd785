"""Native (C) host-side kernels, loaded via ctypes with python fallbacks.

Pattern shared with utils/phoc: compile on first use into
~/.cache/mmf_tpu, plain C ABI (no CPython API), every entry point has a
bit-identical python fallback so a missing compiler never breaks a run.
"""

from mmf_tpu.utils.native.editdist import anls_best, edit_distance  # noqa: F401
