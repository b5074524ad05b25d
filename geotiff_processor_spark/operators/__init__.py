from . import ann, dedup, knn, pip, pyramid, tiling, zonal  # noqa: F401
