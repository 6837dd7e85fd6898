from . import binning, cells, geodesy, ids, images  # noqa: F401
