"""Scalar/array function library (JVM-side Column expressions).

Everything here compiles to Catalyst expressions (no Python UDFs), so
it runs inside whole-stage codegen. The hash functions are defined by
explicit arithmetic (not engine builtins) so a DuckDB oracle can
reproduce them bit-for-bit — see queries/registry.py.
"""
