"""Multi-chip execution: mesh-sharded kernels and the distributed query plan.

The reference scales by (a) fanning queries out across segments stored in a
distributed KV store and (b) running stateless competing workers (SURVEY.md §2
parallelism table). The TPU mapping:

- rows of a segment shard over the mesh's "data" axis for brute-force scans,
  ADC scans, and k-means training (per-shard compute + ICI collectives);
- whole segments place on specific devices for graph traversal (the adjacency
  gather stays device-local; segments are the distribution unit, exactly as
  they are the FDB-range unit in the reference);
- background builds dispatch per segment to the device owning it.
"""
