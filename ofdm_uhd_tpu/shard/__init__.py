"""Sharding / distribution layer (T4): mesh construction, shard_map wrappers,
overlap-save halo exchange, psum channel/CFO tracking, multi-host init.

SURVEY.md §2.3: the two mesh axes for this workload are
  'frame' — batched-capture data parallelism (shard frames over chips)
  'time'  — continuous-stream sequence parallelism (shard time-blocks,
            ppermute halos, psum averaging)
"""

from .mesh import make_mesh
from .frame_parallel import rx_frames_sharded, tx_frames_sharded

__all__ = ["make_mesh", "rx_frames_sharded", "tx_frames_sharded"]
