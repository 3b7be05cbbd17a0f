"""Pure-numpy signature kernels + Spark column-expression scalar functions.

The numpy kernels here are the single source of truth: the Spark pandas UDFs
(operators/sketch.py) and the single-process parity oracle used by tests both
call these exact functions, so "same shingle/signature config" parity is by
construction.
"""
