from pynama_tpu.elements.kle import (
    ElementMatrices, ElementOperators, curl_tensor, vorticity_curl_tensor,
    srt_tensor, div_srt_tensor, compute_kle_matrices, compute_operators,
)
