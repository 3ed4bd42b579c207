"""Core runtime: host-side coordinator (lifecycle state machine, gid maps, task
scheduling, durability) around the device-resident segment data plane.

The reference delegates durability/atomicity/distribution to FoundationDB; here
HBM is volatile, so the control plane journals through a pluggable IndexStorage
(persist.py) and all shared-state mutations serialize on a per-index lock —
the single-writer design SURVEY.md §7 calls for.
"""
