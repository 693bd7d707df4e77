"""Function-level extensions: vectorized Pandas-UDF kernels and UDAFs.

The reference's only "UDAF" surface is inline ``AggregateFunction``
classes (SURVEY §2.12, e.g. HotItemApp.java:76-97) — here that role is
played by built-in aggregates everywhere possible, plus these
Arrow-batched kernels for the cases where Python math is genuinely
needed (wide-vector similarity, custom aggregation).
"""
