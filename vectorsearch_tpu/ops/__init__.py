"""Pure compute kernels (no storage dependencies) — the TPU-native counterpart of
the reference's algorithm layer (util/Distances.java, pq/, graph/).

Everything here operates on jax arrays, is jit-compatible, and carries no index
state. The MXU-heavy formulations (pairwise distances as matmuls, k-means assign
as matmul+argmin, ADC as LUT gather) are the point of the rebuild.
"""
