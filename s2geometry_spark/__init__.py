"""s2geometry_spark — a PySpark-native spherical spatial-join + tiling engine.

From-scratch re-expression of S2's query capabilities (Hilbert cell ids,
region coverings, point-in-polygon containment joins, cell-expansion kNN)
as vectorized NumPy kernels inside pandas/Arrow UDFs over DataFrames.
Reference semantics: SINHASantos/s2geometry (read-only study copy).
"""

__version__ = "0.1.0"
