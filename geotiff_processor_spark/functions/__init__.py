from . import encodings, geo, parsing, text  # noqa: F401
