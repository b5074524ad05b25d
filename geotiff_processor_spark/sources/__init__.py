from . import synth, testdata  # noqa: F401
