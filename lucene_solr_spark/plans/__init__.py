from .query import (  # noqa: F401
    BooleanQuery,
    MatchAllQuery,
    PhraseQuery,
    Query,
    TermQuery,
    parse_query,
    query_terms,
    rewrite,
)
