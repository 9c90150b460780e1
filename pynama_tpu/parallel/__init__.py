from pynama_tpu.parallel.sharded_engine import ShardedEngine, \
    build_sharded_ops
