"""Scalar function helpers shared across operators."""
