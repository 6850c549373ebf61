"""Distributed operators: ordering, dedup, politeness budgets, bloom seen-set.

Each module implements one "custom design" item from SURVEY.md §4 as a
composition of built-in DataFrame primitives (no custom Catalyst rules).
"""
