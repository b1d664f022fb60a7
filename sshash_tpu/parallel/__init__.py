from .sharded import ShardedEngine, make_mesh, make_sharded_lookup

__all__ = ["ShardedEngine", "make_mesh", "make_sharded_lookup"]
