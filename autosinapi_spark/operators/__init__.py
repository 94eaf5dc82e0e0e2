"""Engine operators — each a composition of DataFrame primitives.

Numbering in docstrings refers to SURVEY.md §2's operator inventory.
"""
