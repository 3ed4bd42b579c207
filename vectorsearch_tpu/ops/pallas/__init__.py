"""Pallas TPU kernels for the hot ops the XLA lowering leaves on the table."""
