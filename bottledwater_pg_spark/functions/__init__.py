"""Scalar/columnar function library: identifier sanitization, type
mapping, text metrics, vector math."""
