from .matcher import fuzzy_match_dfs  # noqa: F401
