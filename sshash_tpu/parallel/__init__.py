from .sharded import (ShardedEngine, ShardedStream, make_mesh,
                      make_sharded_lookup)

__all__ = ["ShardedEngine", "ShardedStream", "make_mesh",
           "make_sharded_lookup"]
