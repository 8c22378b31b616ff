from .mesh import (create_mesh, shard_batch, replicate,  # noqa: F401
                   shard_batch_global, replicate_global)
