"""Parallelization layer (L4): multi-chip spatial domain decomposition.

TPU-native replacement for /root/reference/src/parallel/
(DomainDecomposition + NeighbourCommunicationScheme +
CommunicationPartner + CollectiveCommunication): shard_map over a
device mesh of the cell grid, halo and leaving-particle exchange via
jax.lax.ppermute per axis, global values via one fused psum.
"""
