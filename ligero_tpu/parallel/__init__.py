from .core_step import make_prover_core, make_sharded_prover_core
from .sharded_backend import ShardedBackend

__all__ = ["make_prover_core", "make_sharded_prover_core", "ShardedBackend"]
