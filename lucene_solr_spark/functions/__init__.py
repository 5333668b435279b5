"""Scalar function / value-source library (SURVEY.md §3.11)."""
