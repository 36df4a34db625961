"""Operator recipes over the lake tables (SURVEY.md §2)."""
