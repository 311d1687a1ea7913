from audio_tokens_tpu.parallel.mesh import (
    data_mesh,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = ["data_mesh", "make_mesh", "replicated", "shard_batch"]
