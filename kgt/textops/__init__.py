"""Training-data-pipeline operators over document/embedding tables.

All operators are pure DataFrame compositions (JVM-side, codegen'd)
unless a genuinely sequential/vectorized step requires a Pandas UDF.
Hash-based operators use md5 so DuckDB oracles can reproduce them
bit-for-bit.
"""
