"""Read-side query surface + the driver-facing registry.

Every implemented operator from SURVEY.md §2 registers here as a
(name → spark callable, name → oracle SQL) pair; ``__spark_entry__.py``
just re-exports the registry.
"""

from cdc_practice_spark.queries.registry import ORACLES, QUERIES, register

__all__ = ["QUERIES", "ORACLES", "register"]
