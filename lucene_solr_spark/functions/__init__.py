from . import bm25, smallfloat, varint  # noqa: F401
