"""Vectorized pandas/Arrow UDFs and column-function helpers."""
