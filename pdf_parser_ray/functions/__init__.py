"""Scalar/vector kernel helpers shared by pipeline stages."""
