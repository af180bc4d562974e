"""Mesh sharding, cross-chain collectives, proposal adaptation."""

from .sharding import make_mesh, chain_sharding, shard_sht, sharded_run
from .adapt import (pooled_proposal_sigmas, proposal_sigmas_from_results,
                    adapt_segments)
from .collectives import pooled_moments, split_rhat_device, acceptance_mean

__all__ = ["make_mesh", "chain_sharding", "shard_sht", "sharded_run",
           "pooled_proposal_sigmas", "proposal_sigmas_from_results",
           "adapt_segments",
           "pooled_moments", "split_rhat_device", "acceptance_mean"]
