from . import synth, images  # noqa: F401
