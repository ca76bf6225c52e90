"""Vectorized numpy kernels + their pandas-UDF wrappers.

Everything that crosses the JVM<->Python boundary does so through
Arrow-batched pandas UDFs (input_hint: "no per-row Python"); plain
row-at-a-time Python UDFs are banned in this package.
"""
