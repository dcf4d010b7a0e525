from .oracle import OracleIndex, TopDocs  # noqa: F401
