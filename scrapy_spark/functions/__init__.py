"""Scalar/vectorized function library (pure-Python kernels + Spark UDF wrappers)."""
