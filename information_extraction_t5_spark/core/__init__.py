"""Pure-Python semantic kernels shared by Arrow UDFs and unit tests.

These modules hold the *row-level* semantics of the reference pipeline
(/root/reference) re-implemented from scratch. They are deliberately free of
any Spark import so that (a) pytest can exercise them without a JVM and
(b) the Arrow-batched UDFs in ``operators/`` can call them per batch.
"""
