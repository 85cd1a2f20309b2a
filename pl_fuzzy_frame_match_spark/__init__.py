"""PySpark-native fuzzy-match engine with the query and data-processing
capabilities of ``Edwardvaneechoud/pl-fuzzy-frame-match`` (reference at
/root/reference, studied for semantics only), re-expressed Spark-first,
plus large-scale training-data pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing, streaming).
"""

from .functions.kernels import similarity_column
from .models import FUZZY_TYPES, FuzzyMapping, FuzzyTypeLiteral
from .operators.matcher import (
    fuzzy_match_dfs,
    fuzzy_match_dfs_with_context,
    fuzzy_match_temp_dir,
)

__all__ = [
    "FuzzyMapping",
    "FuzzyTypeLiteral",
    "FUZZY_TYPES",
    "fuzzy_match_dfs",
    "fuzzy_match_dfs_with_context",
    "fuzzy_match_temp_dir",
    "similarity_column",
]

__version__ = "0.1.0"
