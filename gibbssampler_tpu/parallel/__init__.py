"""Mesh sharding, cross-chain collectives, proposal adaptation."""

from .sharding import make_mesh, chain_sharding, shard_sht, sharded_run
from .adapt import pooled_proposal_sigmas, adapt_segments

__all__ = ["make_mesh", "chain_sharding", "shard_sht", "sharded_run",
           "pooled_proposal_sigmas", "adapt_segments"]
