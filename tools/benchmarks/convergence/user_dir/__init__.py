from . import synth_memes  # noqa: F401
