"""Executor-side operators: graph algebra, iterative algorithms, CSR kernels."""
