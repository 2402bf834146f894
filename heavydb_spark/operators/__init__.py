"""Composed DataFrame operators.

Each module re-expresses a reference operator family (SURVEY.md §2) as a
composition of built-in Spark DataFrame ops — Pandas UDFs only where the
built-ins genuinely can't express the semantics (SURVEY.md §2.9 rule).
"""
