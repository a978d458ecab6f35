"""Column-expression builders.

Everything here compiles to Catalyst expressions (JVM-side, whole-stage
codegen) — the fast path.  Arrow UDF fallbacks live in ``operators/``.
"""
