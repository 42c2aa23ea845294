"""Driver-checkable query catalog.

Import :mod:`registry` and call :func:`registry.load_all` (done lazily on
first access) — each plan module registers its queries with a DuckDB
oracle twin where SQL-expressible.
"""

from . import registry  # noqa: F401
