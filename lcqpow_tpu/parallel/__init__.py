from .sharding import (  # noqa: F401
    make_mesh,
    shard_batch,
    solve_batch_sharded,
    fleet_summary,
)
