from pynama_tpu.parallel.slab import SlabPartition, make_partition
from pynama_tpu.parallel.sharded import ShardedKLE
