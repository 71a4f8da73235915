"""Scalar function families (2.F)."""
