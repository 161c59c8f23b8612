"""End-to-end pipelines (the reference's EP1 ETL, re-expressed)."""

from .warehouse import build_ojol_warehouse, clean_fact  # noqa: F401
