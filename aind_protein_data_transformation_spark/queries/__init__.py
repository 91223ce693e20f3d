"""Checkable query registry (driver contract).

Importing this package imports every query module, which registers its
queries as a side effect. ``queries()`` / ``oracle_sql()`` are re-exported
for ``__spark_entry__``.
"""

from .registry import REGISTRY, oracle_sql, queries, query  # noqa: F401

# Import order = SURVEY.md §7 milestone order; each module registers on import.
from . import relational  # noqa: E402,F401
from . import tpch_extra  # noqa: E402,F401
from . import scalar_packs  # noqa: E402,F401
from . import llm_dedup  # noqa: E402,F401
from . import llm_similarity  # noqa: E402,F401
from . import llm_text  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import asof_queries  # noqa: E402,F401
from . import array_queries  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401

__all__ = ["REGISTRY", "queries", "oracle_sql", "query"]
