from pynama_tpu.ops.apply import (
    ElementOp, apply_op, fanin_sum, element_gather, assembled_diagonal,
    assemble_dense,
)
